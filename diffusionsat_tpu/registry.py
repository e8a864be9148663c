"""Model / dataset / solver registries.

Port of reference `registry/registry.py:63-115` without the
subprocess-to-dodge-circular-imports hack (`config.py:11-20`): plain
name->factory maps resolved lazily.
"""

from __future__ import annotations

from typing import Any, Callable


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._items: dict[str, Callable[[], Any]] = {}

    def register(self, name: str, factory: Callable[[], Any]) -> None:
        self._items[name] = factory

    def resolve(self, name: str):
        if name not in self._items:
            raise ModuleNotFoundError(
                f"{self.kind} '{name}' is not registered! Available:"
                f" {sorted(self._items)}")
        return self._items[name]()

    @property
    def registered_names(self) -> list[str]:
        return sorted(self._items)


def _model_entry(module: str, cfg_name: str, init_name: str, apply_name: str):
    def factory():
        import importlib
        mod = importlib.import_module(module)
        return (getattr(mod, cfg_name), getattr(mod, init_name),
                getattr(mod, apply_name))
    return factory


MODEL_REGISTRY = Registry("model")
MODEL_REGISTRY.register("query_sat", _model_entry(
    "diffusionsat_tpu.models.query_sat", "QuerySATConfig", "query_sat_init",
    "query_sat_apply"))
MODEL_REGISTRY.register("query_sat_lit", _model_entry(
    "diffusionsat_tpu.models.query_sat_lit", "QuerySATLitConfig",
    "query_sat_lit_init", "query_sat_lit_apply"))
MODEL_REGISTRY.register("neuro_sat", _model_entry(
    "diffusionsat_tpu.models.neuro_sat", "NeuroSATConfig", "neuro_sat_init",
    "neuro_sat_apply"))
MODEL_REGISTRY.register("neurocore", _model_entry(
    "diffusionsat_tpu.models.neurocore", "NeuroCoreConfig", "neurocore_init",
    "neurocore_apply"))
MODEL_REGISTRY.register("simple_neurosat", _model_entry(
    "diffusionsat_tpu.models.neurocore", "SimpleNeuroSATConfig",
    "simple_neurosat_init", "simple_neurosat_apply"))
MODEL_REGISTRY.register("attention_sat", _model_entry(
    "diffusionsat_tpu.models.attention_sat", "AttentionSATConfig",
    "attention_sat_init", "attention_sat_apply"))
MODEL_REGISTRY.register("anf_sat", _model_entry(
    "diffusionsat_tpu.models.anf_sat", "ANFSATConfig", "anf_sat_init",
    "anf_sat_apply"))


def _dataset_entry(module: str, name: str):
    def factory():
        import importlib
        return getattr(importlib.import_module(module), name)
    return factory


DATASET_REGISTRY = Registry("dataset")
DATASET_REGISTRY.register("ksat", _dataset_entry(
    "diffusionsat_tpu.data.generators", "KSatInstances"))
DATASET_REGISTRY.register("3-sat", _dataset_entry(
    "diffusionsat_tpu.data.generators", "SAT3Instances"))
DATASET_REGISTRY.register("diffusion-sat", _dataset_entry(
    "diffusionsat_tpu.data.generators", "DiffusionSatInstances"))
DATASET_REGISTRY.register("clique", _dataset_entry(
    "diffusionsat_tpu.data.graph_tasks", "CliqueInstances"))
DATASET_REGISTRY.register("domset", _dataset_entry(
    "diffusionsat_tpu.data.graph_tasks", "DomSetInstances"))
DATASET_REGISTRY.register("kcolor", _dataset_entry(
    "diffusionsat_tpu.data.graph_tasks", "KColorInstances"))
DATASET_REGISTRY.register("splot", _dataset_entry(
    "diffusionsat_tpu.data.loaders", "SplotInstances"))
DATASET_REGISTRY.register("satlib", _dataset_entry(
    "diffusionsat_tpu.data.loaders", "SatLibInstances"))
DATASET_REGISTRY.register("primes", _dataset_entry(
    "diffusionsat_tpu.data.loaders", "PrimesInstances"))
DATASET_REGISTRY.register("mixed", _dataset_entry(
    "diffusionsat_tpu.data.loaders", "MixedInstances"))
DATASET_REGISTRY.register("sha1", _dataset_entry(
    "diffusionsat_tpu.data.sha", "Sha1Instances"))
DATASET_REGISTRY.register("anf", _dataset_entry(
    "diffusionsat_tpu.data.anf", "RandomAnfInstances"))
DATASET_REGISTRY.register("sha1-anf", _dataset_entry(
    "diffusionsat_tpu.data.sha_anf", "Sha1AnfInstances"))


# reference registry spellings (reference registry/registry.py:78-101) as
# aliases, so commands written against the reference work verbatim
DATASET_REGISTRY.register("k-sat", _dataset_entry(
    "diffusionsat_tpu.data.generators", "KSatInstances"))
DATASET_REGISTRY.register("k_color", _dataset_entry(
    "diffusionsat_tpu.data.graph_tasks", "KColorInstances"))
DATASET_REGISTRY.register("dominating_set", _dataset_entry(
    "diffusionsat_tpu.data.graph_tasks", "DomSetInstances"))
DATASET_REGISTRY.register("mix_sat", _dataset_entry(
    "diffusionsat_tpu.data.loaders", "MixedInstances"))
DATASET_REGISTRY.register("sha-gen", _dataset_entry(
    "diffusionsat_tpu.data.sha", "Sha1Instances"))
DATASET_REGISTRY.register("sha-gen2019", _dataset_entry(
    "diffusionsat_tpu.data.sha", "Sha1Instances"))
DATASET_REGISTRY.register("sha-anf", _dataset_entry(
    "diffusionsat_tpu.data.sha_anf", "Sha1AnfInstances"))
MODEL_REGISTRY.register("simple_neuro_sat", _model_entry(
    "diffusionsat_tpu.models.neurocore", "NeuroCoreConfig",
    "neurocore_init", "neurocore_apply"))


SOLVER_REGISTRY = Registry("sat_solver")
SOLVER_REGISTRY.register("cdcl", _dataset_entry(
    "diffusionsat_tpu.sat.solvers", "NativeCDCL"))
SOLVER_REGISTRY.register("glucose", _dataset_entry(
    "diffusionsat_tpu.sat.solvers", "NativeCDCL"))
SOLVER_REGISTRY.register("walksat", _dataset_entry(
    "diffusionsat_tpu.sat.solvers", "NativeWalkSAT"))
SOLVER_REGISTRY.register("unigen", _dataset_entry(
    "diffusionsat_tpu.sat.solvers", "UniformSampler"))
# reference solver names -> nearest in-process equivalents
SOLVER_REGISTRY.register("default", _dataset_entry(
    "diffusionsat_tpu.sat.solvers", "NativeCDCL"))
SOLVER_REGISTRY.register("lingeling", _dataset_entry(
    "diffusionsat_tpu.sat.solvers", "NativeCDCL"))
SOLVER_REGISTRY.register("treengeling", _dataset_entry(
    "diffusionsat_tpu.sat.solvers", "NativeCDCL"))
SOLVER_REGISTRY.register("quicksampler", _dataset_entry(
    "diffusionsat_tpu.sat.solvers", "NativeWalkSAT"))
