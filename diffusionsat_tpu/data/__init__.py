from diffusionsat_tpu.data.generators import (
    SatInstances,
    KSatInstances,
    SAT3Instances,
    DiffusionSatInstances,
)
from diffusionsat_tpu.data.datasets import SatDataset, PackedBatches
