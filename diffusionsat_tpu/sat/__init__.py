from diffusionsat_tpu.sat.cnf import CNF, VariableAssignment
from diffusionsat_tpu.sat.solvers import (
    SatSolver,
    NativeCDCL,
    NativeWalkSAT,
    UniformSampler,
    default_solver,
)
