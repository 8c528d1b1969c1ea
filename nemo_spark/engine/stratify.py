"""Stratification of rule programs.

Mirrors nemo's selection-strategy stack (reference:
``nemo/src/execution/selection_strategy/strategy_stratified_negation.rs:27-52``):
rules with negation or aggregation over a predicate must run in a strictly
later stratum than the rules deriving that predicate. Within a stratum, the
engine round-robins rules to fixpoint
(``strategy_round_robin.rs:14-62``).

Implementation: condensation of the rule dependency graph (Tarjan SCC over
predicates), topological order, with the constraint that a negative/aggregate
edge inside an SCC is an error (non-stratifiable program).
"""

from __future__ import annotations

from collections import defaultdict

from nemo_spark.model.rules import Program, Rule


def stratify(program: Program) -> list[list[Rule]]:
    """Partition rules into an ordered list of strata."""
    # Edges between predicates: pos (same-or-later stratum), neg (strictly later).
    pos_edges: dict[str, set[str]] = defaultdict(set)  # body -> head
    neg_edges: dict[str, set[str]] = defaultdict(set)
    idb = program.idb_predicates()
    for r in program.rules:
        has_agg = r.head_aggregate() is not None
        # heads of one rule are derived together: tie them into one SCC
        hs = [h.pred for h in r.heads()]
        for h1 in hs:
            for h2 in hs:
                if h1 != h2:
                    pos_edges[h1].add(h2)
        for h in r.heads():
            for a in r.body:
                if a.pred in idb:
                    (neg_edges if has_agg else pos_edges)[a.pred].add(h.pred)
            for a in r.negated:
                if a.pred in idb:
                    neg_edges[a.pred].add(h.pred)

    preds = sorted(idb | {p for p in program.facts} | set(pos_edges) | set(neg_edges))
    index = {p: i for i, p in enumerate(preds)}
    n = len(preds)
    adj: list[list[int]] = [[] for _ in range(n)]
    for src, dsts in list(pos_edges.items()) + list(neg_edges.items()):
        for dst in dsts:
            adj[index[src]].append(index[dst])

    comp = _tarjan_scc(n, adj)

    # negative edge inside an SCC => not stratifiable
    for src, dsts in neg_edges.items():
        for dst in dsts:
            if comp[index[src]] == comp[index[dst]]:
                raise ValueError(
                    f"program not stratifiable: negation/aggregation cycle through {src} -> {dst}"
                )

    # Longest-path stratum numbers over the condensation (neg edges bump +1).
    ncomp = max(comp) + 1 if n else 0
    comp_adj: list[set[tuple[int, int]]] = [set() for _ in range(ncomp)]
    for src, dsts in pos_edges.items():
        for dst in dsts:
            a, b = comp[index[src]], comp[index[dst]]
            if a != b:
                comp_adj[a].add((b, 0))
    for src, dsts in neg_edges.items():
        for dst in dsts:
            comp_adj[comp[index[src]]].add((comp[index[dst]], 1))

    stratum_of_comp = [0] * ncomp
    # relax in reverse topological order of Tarjan output (Tarjan emits reverse topo)
    order = sorted(range(ncomp), reverse=True)  # comp ids: later id = earlier in topo
    changed = True
    iters = 0
    while changed:  # small graphs; Bellman-Ford style is fine
        changed = False
        iters += 1
        if iters > ncomp + 2:
            raise ValueError("stratification did not converge (cycle?)")
        for c in order:
            for dst, w in comp_adj[c]:
                if stratum_of_comp[dst] < stratum_of_comp[c] + w:
                    stratum_of_comp[dst] = stratum_of_comp[c] + w
                    changed = True

    def stratum_of_pred(p: str) -> int:
        return stratum_of_comp[comp[index[p]]] if p in index else 0

    nstrata = (max(stratum_of_comp) + 1) if ncomp else 1
    strata: list[list[Rule]] = [[] for _ in range(nstrata)]
    for r in program.rules:
        strata[stratum_of_pred(r.head.pred)].append(r)
    return [s for s in strata if s]


def _tarjan_scc(n: int, adj: list[list[int]]) -> list[int]:
    """Iterative Tarjan; returns component id per node (reverse topo order)."""
    comp = [-1] * n
    low = [0] * n
    num = [-1] * n
    stack: list[int] = []
    on_stack = [False] * n
    counter = [0]
    ncomp = [0]

    for root in range(n):
        if num[root] != -1:
            continue
        work: list[tuple[int, int]] = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                num[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if num[w] == -1:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif on_stack[w]:
                    low[v] = min(low[v], num[w])
            if recurse:
                continue
            if low[v] == num[v]:
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    comp[w] = ncomp[0]
                    if w == v:
                        break
                ncomp[0] += 1
            work.pop()
            if work:
                u = work[-1][0]
                low[u] = min(low[u], low[v])
    return comp
