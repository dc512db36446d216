from neuralrgbd_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    make_sharded_train_step,
    make_sharded_infer_step,
)
