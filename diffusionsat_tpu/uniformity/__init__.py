from diffusionsat_tpu.uniformity.benchmarks_file import BenchmarksFile
from diffusionsat_tpu.uniformity.samplers import (
    ExactUniformSampler,
    WalkSatSampler,
)
