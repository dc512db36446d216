from neuralrgbd_tpu.ops.pallas.resample import resample_dpv_pallas
