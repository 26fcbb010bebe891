"""SPARQL-style basic-graph-pattern (BGP) matching over the triples
Dataset — the generic query surface the reference exposes only as
fixed listings (get_classes, get_individuals, search:
ontology_manager.py:2301-2396).  A BGP is a list of triple patterns
whose terms are either constants or ``?var`` variables; the result is
the multiset of variable bindings satisfying every pattern, i.e. the
conjunctive query / SELECT fragment of SPARQL 1.0.

Ray-Data-first shape (nothing here is driver-side):

- **Pattern scan**: each pattern compiles to ONE ``map_batches`` over
  the triples Dataset — pyarrow equality masks on the constant
  positions, then a projection that renames the variable positions to
  their variable names.  Only bound columns leave the scan, so a
  2-variable pattern ships 2 string columns no matter how wide the
  store is.
- **Join planning**: greedy — start at the most-constant (most
  selective) pattern, then repeatedly pick a pattern sharing at least
  one bound variable (avoiding Cartesian blowups); ties prefer more
  constants.  A genuinely disconnected BGP raises rather than silently
  cross-joining.
- **Equijoin**: bucket-hash join in the repo's established idiom
  (stages/windows.py): both sides get ``_bucket = hash(key) % B`` in a
  ``map_batches``, union, one sort-shuffle on the bucket, and a
  per-bucket vectorized ``pd.merge`` — the only data moving is the
  binding columns themselves.  At 100 TB the bucket count is the knob
  (keys are entity URIs, so skew follows entity popularity; the same
  salting argument as canonicalize applies if one URI dominates).
- **Filters**: optional ``(var, op, var-or-const)`` constraints applied
  as soon as every referenced variable is bound — inequality
  self-join guards like ``?a < ?b`` run inside the join's output batch,
  never as a post-collect.

Semantics notes: matching is on the stored string value (the SQL
mirror joins the same columns), bindings are a MULTISET (no implicit
DISTINCT — multiplicities must match the SQL join's), and the public
``bgp_bindings_tagged`` folds each solution row into one canonical
``?a=..|?b=..`` string so differently-shaped BGPs can share a tagged
union slot.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_POS = ("subject", "predicate", "object")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _pattern_vars(pat) -> list:
    return [t for t in pat if _is_var(t)]


def _scan_pattern(triples_ds, pat):
    """One column-pruned filtered projection per pattern: constants
    become pyarrow equality masks, variables become output columns
    named after the variable (without the '?')."""
    consts = [(col, t) for col, t in zip(_POS, pat) if not _is_var(t)]
    # variable -> list of positions (a repeated var inside one pattern,
    # e.g. (?x ?p ?x), adds an intra-pattern equality mask)
    var_pos = {}
    for col, t in zip(_POS, pat):
        if _is_var(t):
            var_pos.setdefault(t[1:], []).append(col)

    def scan(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = None
        for col, val in consts:
            m = pc.equal(t[col], val)
            mask = m if mask is None else pc.and_(mask, m)
        for positions in var_pos.values():
            for a, b in zip(positions, positions[1:]):
                m = pc.equal(t[a], t[b])
                mask = m if mask is None else pc.and_(mask, m)
        f = t.filter(mask) if mask is not None else t
        return pa.table({v: f[pos[0]].cast(pa.string())
                         for v, pos in var_pos.items()})

    return triples_ds.map_batches(scan, batch_format="pyarrow"), \
        set(var_pos)


def _bucket_hash(df: pd.DataFrame, key_vars, num_buckets: int) -> np.ndarray:
    key = df[key_vars[0]].astype(str)
    for v in key_vars[1:]:
        key = key + "\x1f" + df[v].astype(str)
    h = pd.util.hash_pandas_object(key, index=False)
    return (h % num_buckets).to_numpy().astype(np.int32)


def _equijoin(left_ds, left_vars, right_ds, right_vars, num_buckets: int,
              how: str = "inner"):
    """Bucket-hash join of two binding Datasets on their shared
    variables (``how``: inner for required patterns, left for
    OPTIONAL).  Both sides ship only their binding columns; the join
    itself is one vectorized ``pd.merge`` per bucket."""
    on = sorted(left_vars & right_vars)
    all_vars = sorted(left_vars | right_vars)

    def tag(side, cols):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {v: df[v].astype(str) if v in cols
                 else pd.Series([None] * len(df), dtype=object)
                 for v in all_vars})
            out["_side"] = np.full(len(df), side, dtype=np.int8)
            out["_bucket"] = _bucket_hash(df, on, num_buckets) \
                if len(df) else np.array([], dtype=np.int32)
            return out
        return f

    unioned = left_ds.map_batches(tag(0, left_vars), batch_format="pandas") \
        .union(right_ds.map_batches(tag(1, right_vars),
                                    batch_format="pandas"))

    def join(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 0][sorted(left_vars)]
        r = g[g["_side"] == 1][sorted(right_vars)]
        if not len(l) or (how == "inner" and not len(r)):
            return pd.DataFrame({v: pd.Series([], dtype=object)
                                 for v in all_vars})
        m = l.merge(r, on=on, how=how)
        out = m[all_vars]
        if how == "left":
            # unmatched OPTIONAL vars surface as None (folded to the
            # 'NULL' sentinel by bgp_bindings_tagged / COALESCE in SQL)
            out = out.astype(object).where(out.notna(), None)
        return out

    return unioned.groupby("_bucket").map_groups(join,
                                                 batch_format="pandas"), \
        set(all_vars)


_OPS = {
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
}


def _apply_filters(ds, bound, filters, applied):
    """Apply every not-yet-applied filter whose variables are all
    bound; string comparison semantics (both engines compare the
    stored string — the SQL mirror does the same)."""
    todo = [i for i, (a, op, b) in enumerate(filters)
            if i not in applied
            and (a[1:] in bound)
            and (not _is_var(b) or b[1:] in bound)]
    if not todo:
        return ds, applied
    specs = [filters[i] for i in todo]

    def f(df: pd.DataFrame) -> pd.DataFrame:
        m = np.ones(len(df), dtype=bool)
        for a, op, b in specs:
            lhs = df[a[1:]].astype(str)
            rhs = df[b[1:]].astype(str) if _is_var(b) else b
            m &= _OPS[op](lhs, rhs).to_numpy()
        return df[m]

    return ds.map_batches(f, batch_format="pandas"), applied | set(todo)


def match_bgp(triples_ds, patterns, select=None, filters=(),
              optional=(), num_buckets: int = 32):
    """Evaluate a basic graph pattern; returns a Dataset with one
    string column per selected variable (all variables if ``select``
    is None, sorted by name).

    ``optional`` patterns are SPARQL OPTIONAL: each is LEFT-joined
    against the required bindings after all required patterns, so
    solutions survive with ``None`` for the optional variables when
    the pattern has no match.  Optional patterns must join on
    required-bound variables (join keys can't themselves be nullable),
    and ``filters`` may reference required variables only — the two
    standard restrictions that keep left-join semantics unambiguous."""
    if not patterns:
        raise ValueError("empty BGP")
    scans = []
    for pat in patterns:
        if len(pat) != 3:
            raise ValueError(f"pattern must be (s, p, o): {pat!r}")
        scans.append((_scan_pattern(triples_ds, pat),
                      sum(0 if _is_var(t) else 1 for t in pat)))

    # greedy plan: most constants first, then connected patterns only
    order = sorted(range(len(scans)),
                   key=lambda i: (-scans[i][1], i))
    first = order[0]
    cur, bound = scans[first][0]
    remaining = [i for i in order if i != first]
    applied: set = set()
    cur, applied = _apply_filters(cur, bound, filters, applied)
    while remaining:
        nxt = None
        for i in remaining:
            if scans[i][0][1] & bound:
                nxt = i
                break
        if nxt is None:
            raise ValueError(
                "disconnected BGP (would require a Cartesian product): "
                f"bound={sorted(bound)}")
        (rds, rvars), _ = scans[nxt]
        cur, bound = _equijoin(cur, bound, rds, rvars, num_buckets)
        remaining.remove(nxt)
        cur, applied = _apply_filters(cur, bound, filters, applied)
    if len(applied) != len(filters):
        missing = [filters[i] for i in range(len(filters))
                   if i not in applied]
        raise ValueError(f"filter references unbound variable: {missing}")
    required_bound = set(bound)
    for pat in optional:
        if len(pat) != 3:
            raise ValueError(f"pattern must be (s, p, o): {pat!r}")
        rds, rvars = _scan_pattern(triples_ds, pat)
        on = rvars & bound
        if not on:
            raise ValueError(f"OPTIONAL pattern shares no variable with "
                             f"the required BGP: {pat!r}")
        if not on <= required_bound:
            raise ValueError(
                "OPTIONAL pattern joins on a nullable optional "
                f"variable: {sorted(on - required_bound)}")
        cur, bound = _equijoin(cur, bound, rds, rvars, num_buckets,
                               how="left")
    keep = sorted(bound) if select is None \
        else [v[1:] for v in select]
    for v in keep:
        if v not in bound:
            raise ValueError(f"selected variable ?{v} not bound by the BGP")

    def project(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keep].astype(object)
        return out.where(out.notna(), None)

    return cur.map_batches(project, batch_format="pandas")


def bgp_bindings_tagged(triples_ds, name: str, patterns, select=None,
                        filters=(), optional=(), num_buckets: int = 32):
    """Run a BGP and fold each solution into ONE canonical string
    ``?a=v1|?b=v2`` (variables sorted by name, unmatched OPTIONAL
    variables as the ``NULL`` sentinel — COALESCE in the SQL mirror)
    so BGPs of different shapes can share a tagged union slot:
    output (q, binding)."""
    ds = match_bgp(triples_ds, patterns, select=select, filters=filters,
                   optional=optional, num_buckets=num_buckets)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = sorted(df.columns)
        if not len(df):
            return pd.DataFrame({"q": pd.Series([], dtype=object),
                                 "binding": pd.Series([], dtype=object)})
        s = "?" + cols[0] + "=" + df[cols[0]].fillna("NULL").astype(str)
        for c in cols[1:]:
            s = s + "|?" + c + "=" + df[c].fillna("NULL").astype(str)
        return pd.DataFrame({"q": np.full(len(df), name, dtype=object),
                             "binding": s.to_numpy()})

    return ds.map_batches(fold, batch_format="pandas")
