from neuralrgbd_tpu.train.loss import nll_dpv_loss
from neuralrgbd_tpu.train.step import TrainState, create_train_state, make_train_step
