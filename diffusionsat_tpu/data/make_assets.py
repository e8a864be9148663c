"""Generate the bundled task assets under data/assets/ (committed).

The reference ships real-world SPLOT feature models (data/splot/*.xml)
and pre-fetched toughsat factoring CNFs so `--task splot` / `--task
primes` run out of the box. We can't redistribute those files; instead
this script deterministically generates stand-ins in the SAME file
formats:

- assets/splot/: synthetic 3-CNF feature models in the SPLOT XML layout
  the loader parses (a <constraints> block of `Clause3CNF_k: f OR ~g OR
  h` lines over named features, reference data/splot.py:50-77). Each
  model is guaranteed SAT by construction (clauses generated around a
  hidden assignment, like SPLOT's own `-SAT-` generator outputs).
- assets/primes/: factoring CNFs from data/primes_gen.py (exact Tseitin
  multiplier; models are exactly the nontrivial factor pairs).

    python -m diffusionsat_tpu.data.make_assets
"""

from __future__ import annotations

import random
from pathlib import Path

from diffusionsat_tpu.data.primes_gen import semiprime_instances

ASSETS = Path(__file__).resolve().parent / "assets"


def make_splot_xml(n_features: int, n_clauses: int, seed: int,
                   name: str) -> str:
    rng = random.Random(seed)
    feats = [f"f_{i + 1}" for i in range(n_features)]
    hidden = {f: rng.random() < 0.5 for f in feats}
    lines = []
    for k in range(1, n_clauses + 1):
        picks = rng.sample(feats, 3)
        # ensure the hidden assignment satisfies the clause: at least one
        # literal agrees with it
        lits = []
        sat_pos = rng.randrange(3)
        for i, f in enumerate(picks):
            if i == sat_pos:
                neg = not hidden[f]
            else:
                neg = rng.random() < 0.5
            lits.append(("~" if neg else "") + f)
        lines.append(f"Clause3CNF_{k}:" + " OR ".join(lits))
    body = "\n".join(lines)
    return (f'<feature_model name="{name}">\n'
            f"<constraints>\n{body}\n</constraints>\n"
            f"</feature_model>\n")


def main():
    splot_dir = ASSETS / "splot"
    splot_dir.mkdir(parents=True, exist_ok=True)
    for i in range(10):
        # near-threshold ratio (4.1) keeps the model count small enough
        # that the exact-enumeration labeler is fast; SAT by construction
        n_feat = 16 + 3 * i
        n_cls = int(n_feat * 4.1)
        name = f"SYNTH-3CNF-FM-{n_feat}-{n_cls}-SAT-{i + 1}"
        (splot_dir / f"{name}.xml").write_text(
            make_splot_xml(n_feat, n_cls, seed=1000 + i, name=name))
        print(f"wrote splot/{name}.xml")

    primes_dir = ASSETS / "primes"
    primes_dir.mkdir(parents=True, exist_ok=True)
    for name, n_vars, clauses in semiprime_instances(count=12, seed=0):
        lines = [f"p cnf {n_vars} {len(clauses)}"]
        lines += [" ".join(map(str, c)) + " 0" for c in clauses]
        (primes_dir / f"{name}.cnf").write_text("\n".join(lines) + "\n")
        print(f"wrote primes/{name}.cnf ({n_vars} vars)")

    # satlib: uf20-91-style satisfiable uniform random 3-SAT (SATLIB's
    # classic smallest class: 20 vars, 91 clauses, ratio 4.55), generated
    # around a hidden assignment so each file is SAT by construction
    satlib_dir = ASSETS / "satlib"
    satlib_dir.mkdir(parents=True, exist_ok=True)
    for i in range(10):
        rng = random.Random(2000 + i)
        n, m = 20, 91
        hidden = [rng.random() < 0.5 for _ in range(n)]
        lines = [f"p cnf {n} {m}"]
        for _ in range(m):
            vs = rng.sample(range(1, n + 1), 3)
            sat_pos = rng.randrange(3)
            lits = []
            for j, v in enumerate(vs):
                if j == sat_pos:
                    neg = not hidden[v - 1]
                else:
                    neg = rng.random() < 0.5
                lits.append(-v if neg else v)
            lines.append(" ".join(map(str, lits)) + " 0")
        (satlib_dir / f"uf20-synth-{i + 1}.cnf").write_text(
            "\n".join(lines) + "\n")
        print(f"wrote satlib/uf20-synth-{i + 1}.cnf")


if __name__ == "__main__":
    main()
