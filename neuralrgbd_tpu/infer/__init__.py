from neuralrgbd_tpu.infer.step import make_infer_step, predict_next
