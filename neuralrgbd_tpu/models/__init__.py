from neuralrgbd_tpu.models.feature_extractor import FeatureExtractor
from neuralrgbd_tpu.models.knet import KNet
from neuralrgbd_tpu.models.rnet import RNet
from neuralrgbd_tpu.models.kvnet import KVNet, KVNetOutput
from neuralrgbd_tpu.models.guided_filter import RefineNetDGF
from neuralrgbd_tpu.models.refine_legacy import (
    RefineNet3D,
    RefineNetDeMoN,
    RefineNetUnet2D,
    RefineNetUNet3D,
)
