"""SHA-1 ANF encoder tests."""

import pytest

from diffusionsat_tpu.data.sha_anf import Sha1AnfInstances, sha1_anf
from diffusionsat_tpu.graph.anf_batch import evaluate_anf


@pytest.mark.parametrize("seed", range(3))
def test_witness_satisfies_system(seed):
    n, equations, witness = sha1_anf(rounds=4, free_bits=5, seed=seed)
    assert len(witness) == n
    assert evaluate_anf([(n, equations)], [witness]) == [True]
    # degree <= 2 everywhere
    for eq in equations:
        for term in eq:
            assert len(term) <= 2


def test_corrupted_witness_fails():
    n, equations, witness = sha1_anf(rounds=4, free_bits=5, seed=0)
    bad = list(witness)
    bad[0] ^= 1
    assert evaluate_anf([(n, equations)], [bad]) == [False]


def test_instance_stream():
    gen = Sha1AnfInstances(rounds=3, min_free_bits=3, max_free_bits=4,
                           train_size=2, test_size=1)
    items = list(gen.train_generator())
    assert len(items) == 2
    for n, eqs, wit in items:
        assert evaluate_anf([(n, eqs)], [wit]) == [True]
