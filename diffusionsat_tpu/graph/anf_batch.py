"""Static-shape batched ANF (XOR of AND-terms) equation systems.

TPU-native replacement for the reference's ANF pipeline representation
(`data/sha_anf.py:113-168`): node index space is
[0]=constant-one, [1..V]=variables, [V+1..V+A]=AND-pair nodes; the sparse
(1+V+A) x C membership matrix becomes masked sorted edge lists like
graph/batch.py. An equation (clause) is the XOR of its member nodes.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct

Term = tuple  # () = const 1, (i,) = var i (1-based), (i, j) = AND pair


@struct.dataclass
class ANFBucket:
    max_vars: int = struct.field(pytree_node=False)
    max_ands: int = struct.field(pytree_node=False)
    max_clauses: int = struct.field(pytree_node=False)
    max_edges: int = struct.field(pytree_node=False)
    max_graphs: int = struct.field(pytree_node=False)


@struct.dataclass
class ANFBatch:
    # AND-pair definitions: operand node ids in [0, V] (0 = const one)
    and1: jnp.ndarray       # [A] int32
    and2: jnp.ndarray       # [A] int32
    and_mask: jnp.ndarray   # [A] f32
    # node->clause membership edges (node ids in [0, 1+V+A))
    edge_node_c: jnp.ndarray    # [E] int32
    edge_clause_c: jnp.ndarray  # [E] int32, sorted
    edge_mask_c: jnp.ndarray    # [E] f32
    edge_node_n: jnp.ndarray    # [E] int32, sorted by node
    edge_clause_n: jnp.ndarray  # [E] int32
    edge_mask_n: jnp.ndarray    # [E] f32
    # structure masks
    var_mask: jnp.ndarray       # [V] f32
    clause_mask: jnp.ndarray    # [C] f32
    var_graph: jnp.ndarray      # [V] int32 (padding -> G)
    clause_graph: jnp.ndarray   # [C] int32 (padding -> G)
    graph_mask: jnp.ndarray     # [G] f32
    n_vars_per_graph: jnp.ndarray     # [G] f32
    n_clauses_per_graph: jnp.ndarray  # [G] f32
    solutions: jnp.ndarray      # [V] int32
    n_vars: jnp.ndarray         # [] int32
    n_clauses: jnp.ndarray      # [] int32
    n_graphs: jnp.ndarray       # [] int32
    # 1.0 on free message-bit input vars (no equation defines them — the
    # circuit's true degrees of freedom, sat/anf_completion.free_inputs_of);
    # supervised CE can upweight these rows (round-4 finding: free-input
    # accuracy ~76% vs ~93% overall is the solving bottleneck)
    free_input_mask: jnp.ndarray | None = None  # [V] f32

    @property
    def V(self) -> int:
        return self.var_mask.shape[0]

    @property
    def A(self) -> int:
        return self.and1.shape[0]

    @property
    def C(self) -> int:
        return self.clause_mask.shape[0]

    @property
    def G(self) -> int:
        return self.graph_mask.shape[0]

    @property
    def n_value_nodes(self) -> int:
        """1 (const) + V (vars) + A (and nodes)."""
        return 1 + self.V + self.A


def build_anf_batch(systems: Sequence[tuple[int, Sequence[Sequence[Term]]]],
                    bucket: ANFBucket,
                    solutions: Sequence[Sequence[int]] | None = None
                    ) -> ANFBatch:
    """Pack ANF systems [(n_vars, equations)] into one padded ANFBatch.

    Each equation is a list of terms; duplicate AND pairs within a system
    share one AND node (reference sha_anf builds a pair->node map).

    Returns HOST-side numpy arrays (design invariant: batches are numpy
    pytrees; device transfer happens once, at the jitted call or an
    explicit up-front device_put). Building thousands of batches as
    device arrays would round-trip the axon tunnel per array.
    """
    V, A, C, E, G = (bucket.max_vars, bucket.max_ands, bucket.max_clauses,
                     bucket.max_edges, bucket.max_graphs)
    n_graphs = len(systems)
    assert n_graphs <= G

    and1 = np.zeros(A, dtype=np.int32)
    and2 = np.zeros(A, dtype=np.int32)
    and_mask = np.zeros(A, dtype=np.float32)
    var_graph = np.full(V, G, dtype=np.int32)
    clause_graph = np.full(C, G, dtype=np.int32)
    nvpg = np.zeros(G, dtype=np.float32)
    ncpg = np.zeros(G, dtype=np.float32)
    sols = np.zeros(V, dtype=np.int32)
    free_mask = np.zeros(V, dtype=np.float32)

    edge_node: list[int] = []
    edge_clause: list[int] = []

    v_off = 0
    c_off = 0
    a_off = 0
    for g, (n_vars, equations) in enumerate(systems):
        pair_to_node: dict[tuple[int, int], int] = {}
        if v_off + n_vars > V or c_off + len(equations) > C:
            raise ValueError("ANF bucket too small")
        var_graph[v_off:v_off + n_vars] = g
        clause_graph[c_off:c_off + len(equations)] = g
        nvpg[g] = n_vars
        ncpg[g] = len(equations)
        if solutions is not None:
            bits = np.asarray(solutions[g], dtype=np.int32)
            sols[v_off:v_off + n_vars] = bits

        def node_of(term: Term) -> int:
            nonlocal a_off
            if len(term) == 0:
                return 0  # constant one
            if len(term) == 1:
                return 1 + v_off + (term[0] - 1)
            key = (min(term), max(term))
            if key not in pair_to_node:
                if a_off >= A:
                    raise ValueError("ANF bucket too small (ands)")
                and1[a_off] = 1 + v_off + (key[0] - 1)
                and2[a_off] = 1 + v_off + (key[1] - 1)
                and_mask[a_off] = 1.0
                pair_to_node[key] = 1 + V + a_off
                a_off += 1
            return pair_to_node[key]

        for ci, eq in enumerate(equations):
            for term in eq:
                edge_node.append(node_of(tuple(term)))
                edge_clause.append(c_off + ci)

        # free message-bit inputs: the SHA circuit is feed-forward, so
        # every equation's max var id is the gate output it defines; a var
        # that is no equation's max is a free input (same convention as
        # sat/anf_completion.free_inputs_of, which operates on the global
        # ids of an already-built batch)
        defined: set[int] = set()
        for eq in equations:
            vs = [v for term in eq for v in term]
            if vs:
                defined.add(max(vs))
        for v in range(1, n_vars + 1):
            if v not in defined:
                free_mask[v_off + v - 1] = 1.0
        v_off += n_vars
        c_off += len(equations)

    n_edges = len(edge_node)
    if n_edges > E:
        raise ValueError("ANF bucket too small (edges)")

    en = np.asarray(edge_node, dtype=np.int32)
    ec = np.asarray(edge_clause, dtype=np.int32)
    order_c = np.argsort(ec, kind="stable")
    order_n = np.argsort(en[order_c], kind="stable")

    def pad(a, size, fill):
        out = np.full(size, fill, dtype=np.int32)
        out[:len(a)] = a
        return out

    emask = np.zeros(E, dtype=np.float32)
    emask[:n_edges] = 1.0

    var_mask = np.zeros(V, dtype=np.float32)
    var_mask[:v_off] = 1.0
    clause_mask = np.zeros(C, dtype=np.float32)
    clause_mask[:c_off] = 1.0
    graph_mask = np.zeros(G, dtype=np.float32)
    graph_mask[:n_graphs] = 1.0

    return ANFBatch(
        and1=np.asarray(and1), and2=np.asarray(and2),
        and_mask=np.asarray(and_mask),
        edge_node_c=np.asarray(pad(en[order_c], E, V + A)),
        edge_clause_c=np.asarray(pad(ec[order_c], E, C - 1)),
        edge_mask_c=np.asarray(emask),
        edge_node_n=np.asarray(pad(en[order_c][order_n], E, V + A)),
        edge_clause_n=np.asarray(pad(ec[order_c][order_n], E, C - 1)),
        edge_mask_n=np.asarray(emask),
        var_mask=np.asarray(var_mask),
        clause_mask=np.asarray(clause_mask),
        var_graph=np.asarray(var_graph),
        clause_graph=np.asarray(clause_graph),
        graph_mask=np.asarray(graph_mask),
        n_vars_per_graph=np.asarray(nvpg),
        n_clauses_per_graph=np.asarray(ncpg),
        solutions=np.asarray(sols),
        n_vars=np.asarray(v_off, np.int32),
        n_clauses=np.asarray(c_off, np.int32),
        n_graphs=np.asarray(n_graphs, np.int32),
        free_input_mask=np.asarray(free_mask),
    )


def evaluate_anf(systems, solutions) -> list[bool]:
    """Host-side ground truth: each equation (with any constant folded in
    as the const-one term) must XOR to 0 — the encoding under which the
    reference's clause value is +1 and its loss (1 - clauses_real)^2
    vanishes (loss/anf.py:27, model/anf_sat.py:181-185)."""
    out = []
    for (n_vars, equations), bits in zip(systems, solutions):
        ok = True
        for eq in equations:
            acc = 0
            for term in eq:
                if len(term) == 0:
                    val = 1
                elif len(term) == 1:
                    val = bits[term[0] - 1]
                else:
                    val = bits[term[0] - 1] & bits[term[1] - 1]
                acc ^= val
            if acc != 0:
                ok = False
                break
        out.append(ok)
    return out
