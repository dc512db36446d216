from neuralrgbd_tpu.models.feature_extractor import FeatureExtractor
from neuralrgbd_tpu.models.knet import KNet
from neuralrgbd_tpu.models.rnet import RNet
from neuralrgbd_tpu.models.kvnet import KVNet, KVNetOutput
