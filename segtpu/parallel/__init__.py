from segtpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    make_sharded_train_step,
    make_sharded_eval_step,
)
