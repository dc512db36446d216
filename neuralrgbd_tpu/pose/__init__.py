from neuralrgbd_tpu.pose.lba import local_ba_direct, make_lba_optimizer
from neuralrgbd_tpu.pose import dso
