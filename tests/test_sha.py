"""SHA-1 preimage encoder tests (the cgen-binary replacement)."""

import pytest

from diffusionsat_tpu.data.sha import Sha1Instances, sha1_cnf
from diffusionsat_tpu.sat.cnf import check_assignment
from diffusionsat_tpu.sat.solvers import solve


@pytest.mark.parametrize("seed", range(3))
def test_witness_satisfies_and_solver_agrees(seed):
    n, clauses, witness = sha1_cnf(rounds=5, free_bits=5, seed=seed)
    assert len(witness) == n
    assert check_assignment(clauses, witness)
    ok, _ = solve(clauses, n, seed=seed)
    assert ok


def test_free_bits_scale_instance_size():
    n_small, cls_small, _ = sha1_cnf(rounds=4, free_bits=2, seed=0)
    n_big, cls_big, _ = sha1_cnf(rounds=4, free_bits=32, seed=0)
    assert n_big > n_small
    assert len(cls_big) > len(cls_small)


def test_instance_stream():
    gen = Sha1Instances(rounds=4, min_free_bits=3, max_free_bits=5,
                        train_size=2, test_size=1)
    items = list(gen.train_generator())
    assert len(items) == 2
    for n_vars, clauses, witness in items:
        assert check_assignment(clauses, witness)
