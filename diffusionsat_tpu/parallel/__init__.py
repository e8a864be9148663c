from diffusionsat_tpu.parallel.mesh import make_mesh
from diffusionsat_tpu.parallel.dp import make_dp_train_step, stack_batches
