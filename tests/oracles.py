"""Pure-Python PageRank oracle (networkx.pagerank semantics without scipy).

Power iteration: x'(v) = (1-a)/n + a*(Σ_{u→v} x(u)/outdeg(u) + dangling/n),
converged when Σ|x'-x| < n*tol (networkx's criterion). Uniform start,
uniform teleport, dangling mass redistributed uniformly — exactly the
semantics of nx.pagerank(alpha=a), the mandated oracle (BASELINE.json:14).
"""

from __future__ import annotations


def pagerank_oracle(
    nodes, edges, alpha: float = 0.85, tol: float = 1e-12, max_iter: int = 2000
) -> dict:
    """nodes: iterable of hashables; edges: iterable of (u, v) distinct pairs."""
    nodes = list(nodes)
    n = len(nodes)
    if n == 0:
        return {}
    out: dict = {v: [] for v in nodes}
    for u, v in edges:
        out[u].append(v)
    x = {v: 1.0 / n for v in nodes}
    for _ in range(max_iter):
        dangling = sum(x[v] for v in nodes if not out[v])
        nxt = {v: 0.0 for v in nodes}
        for u in nodes:
            ou = out[u]
            if ou:
                share = x[u] / len(ou)
                for v in ou:
                    nxt[v] += share
        base = (1.0 - alpha) / n + alpha * dangling / n
        nxt = {v: base + alpha * nxt[v] for v in nodes}
        err = sum(abs(nxt[v] - x[v]) for v in nodes)
        x = nxt
        if err < n * tol:
            return x
    raise RuntimeError("oracle did not converge")


def ppr_oracle(
    nodes, edges, seeds, alpha: float = 0.85, tol: float = 1e-12,
    max_iter: int = 2000,
) -> dict:
    """Personalized PageRank replica: teleport AND dangling mass on the
    seed distribution (networkx personalization=..., dangling=None)."""
    nodes = list(nodes)
    n = len(nodes)
    if n == 0:
        return {}
    seeds = set(seeds) & set(nodes)
    assert seeds
    tp = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in nodes}
    out: dict = {v: [] for v in nodes}
    for u, v in edges:
        out[u].append(v)
    x = {v: 1.0 / n for v in nodes}
    for _ in range(max_iter):
        dangling = sum(x[v] for v in nodes if not out[v])
        nxt = {v: 0.0 for v in nodes}
        for u in nodes:
            ou = out[u]
            if ou:
                share = x[u] / len(ou)
                for v in ou:
                    nxt[v] += share
        nxt = {
            v: (1.0 - alpha) * tp[v] + alpha * (nxt[v] + dangling * tp[v])
            for v in nodes
        }
        err = sum(abs(nxt[v] - x[v]) for v in nodes)
        x = nxt
        if err < n * tol:
            return x
    raise RuntimeError("oracle did not converge")
