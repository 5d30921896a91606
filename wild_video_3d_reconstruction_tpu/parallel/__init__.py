from .mesh import batch_sharding, make_mesh, param_sharding
from .train_step import TrainConfig, build_train_step, make_synthetic_batch
