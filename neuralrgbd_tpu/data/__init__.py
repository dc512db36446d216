from neuralrgbd_tpu.data.synthetic import synthetic_batch
