"""File-based loader tests (SPLOT XML parsing, SATLIB/primes dirs, mixed)."""

from pathlib import Path

from diffusionsat_tpu.data.loaders import (
    MixedInstances,
    SatLibInstances,
    SplotInstances,
)
from diffusionsat_tpu.sat.cnf import CNF

SPLOT_XML = """<feature_model name="test">
<constraints>
c1: ~1 or 2
c2: 1 or ~3 or 2
c3: 3
</constraints>
</feature_model>
"""


def test_splot_parser(tmp_path):
    for i in range(3):
        (tmp_path / f"model{i}.xml").write_text(SPLOT_XML)
    inst = SplotInstances(tmp_path, test_every_k=3)
    train = list(inst.train_generator())
    test = list(inst.test_generator())
    assert len(train) == 2 and len(test) == 1
    n_vars, clauses, _ = test[0]
    assert n_vars == 3
    assert sorted(map(sorted, clauses)) == sorted(
        map(sorted, [[-1, 2], [1, -3, 2], [3]]))


def test_satlib_loader_split(tmp_path):
    for i in range(5):
        CNF(tmp_path / f"f{i}.cnf", n_vars=3,
            clauses=[[1, 2], [-1, 3]]).store()
    inst = SatLibInstances(tmp_path, test_fraction=0.2)
    train = list(inst.train_generator())
    test = list(inst.test_generator())
    assert len(train) == 4 and len(test) == 1
    assert train[0][0] == 3


def test_mixed_round_robin(tmp_path):
    for i in range(2):
        CNF(tmp_path / f"f{i}.cnf", n_vars=2, clauses=[[1, 2]]).store()
    a = SatLibInstances(tmp_path, test_fraction=0.5)
    b = SatLibInstances(tmp_path, test_fraction=0.5)
    mixed = MixedInstances([a, b], seed=0)
    items = list(mixed.train_generator())
    assert len(items) == 2
