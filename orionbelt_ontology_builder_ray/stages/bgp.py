"""SPARQL-style basic-graph-pattern (BGP) matching over the triples
Dataset — the generic query surface the reference exposes only as
fixed listings (get_classes, get_individuals, search:
ontology_manager.py:2301-2396).  A BGP is a list of triple patterns
whose terms are either constants or ``?var`` variables; the result is
the multiset of variable bindings satisfying every pattern.  The
module covers the practical SPARQL algebra core: SELECT (match_bgp),
FILTER, OPTIONAL (left join), MINUS (anti join), GROUP BY COUNT
(bgp_group_count), property paths ``pred+`` (property_path_closure),
CONSTRUCT (construct_triples), plus a predicate-partitioned store
layout (write_store_by_predicate) for whole-file scan pruning.

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


def _scan_pattern(source, pat):
    """One column-pruned filtered projection per pattern: constants
    become pyarrow equality masks, variables become output columns
    named after the variable (without the '?').

    ``source`` may be a Dataset OR a parquet path (str).  With a path,
    each pattern issues its OWN pruned ``read_parquet``: the constant
    positions become a parquet-level filter expression (row groups
    that cannot match never leave storage — with a predicate-sorted or
    hive-partitioned store that is most of them) and only the variable
    positions' columns are read at all.  The prune-at-the-read path
    for ad-hoc queries against a store at rest."""
    consts = [(col, t) for col, t in zip(_POS, pat) if not _is_var(t)]
    # variable -> list of positions (a repeated var inside one pattern,
    # e.g. (?x ?p ?x), adds an intra-pattern equality mask)
    var_pos = {}
    for col, t in zip(_POS, pat):
        if _is_var(t):
            var_pos.setdefault(t[1:], []).append(col)

    if isinstance(source, str):
        import pyarrow.dataset as pads
        import ray.data as rd

        expr = None
        for col, val in consts:
            e = pads.field(col) == val
            expr = e if expr is None else expr & e
        # a store written by write_store_by_predicate is laid out as
        # `pred_part=<key>/` hive directories: a constant-predicate
        # pattern then reads ONLY its partition's files — whole-file
        # pruning by path (the predicate filter above still applies,
        # so sanitization collisions can't change results)
        pred_const = dict(consts).get("predicate")
        if pred_const is not None:
            import os

            cand = os.path.join(
                source, f"pred_part={predicate_partition_key(pred_const)}")
            if os.path.isdir(cand):
                source = cand
        cols = sorted({p for ps in var_pos.values() for p in ps})
        triples_ds = rd.read_parquet(source, columns=cols or ["subject"],
                                     filter=expr)
        consts = []  # already applied at the read
    else:
        triples_ds = source

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


# a side at most this many binding rows is collected once, ray.put,
# and probed inside map_batches on the other side — zero shuffle (the
# broadcast-small-sides doctrine; above it, the bucket-hash shuffle
# join below is the fallback).  100k URI-string rows ~ 10 MB.
BGP_BROADCAST_ROWS = 100_000


def _broadcast_join(big_ds, big_vars, small_ds, small_vars, how: str):
    """Join with the SMALL side broadcast: one driver collect of the
    small binding table (bounded by BGP_BROADCAST_ROWS at the call
    site), ray.put once, vectorized pd.merge inside every batch of
    the big side — the big side never shuffles at all."""
    import ray

    on = sorted(big_vars & small_vars)
    all_vars = sorted(big_vars | small_vars)
    small = small_ds.to_pandas()
    for v in sorted(small_vars):
        small[v] = small[v].astype(str)
    ref = ray.put(small)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        for v in on:
            df[v] = df[v].astype(str)
        small_df = ray.get(ref)
        if how == "anti":
            # MINUS: keep big-side rows with NO key match
            m = df.merge(small_df[on].drop_duplicates(), on=on,
                         how="left", indicator=True)
            return m[m["_merge"] == "left_only"][sorted(big_vars)]
        m = df.merge(small_df, on=on, how=how)
        out = m[all_vars]
        if how == "left":
            out = out.astype(object).where(out.notna(), None)
        return out

    out_vars = set(big_vars) if how == "anti" else set(all_vars)
    return big_ds.map_batches(probe, batch_format="pandas"), out_vars


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
            # upstream stages may hand over filtered frames with a
            # non-Range index (e.g. drop_duplicates); reset so the
            # fresh None-Series below align row-for-row
            df = df.reset_index(drop=True)
            out = pd.DataFrame(
                {v: df[v].astype(str) if v in cols
                 else pd.Series([None] * len(df), dtype=object)
                 for v in all_vars})
            out["_side"] = np.full(len(df), side, dtype=np.int8)
            out["_bucket"] = _bucket_hash(df, on, num_buckets) \
                if len(df) else np.array([], dtype=np.int32)
            return out
        return f

    # coalesce before the bucket shuffle: the sort's fixed cost grows
    # with block COUNT (hundreds of ~4k-row scan blocks measured 5x
    # slower than the same rows in ~2x-bucket blocks)
    unioned = left_ds.map_batches(tag(0, left_vars), batch_format="pandas") \
        .union(right_ds.map_batches(tag(1, right_vars),
                                    batch_format="pandas")) \
        .repartition(num_buckets)

    out_cols = sorted(left_vars) if how == "anti" else all_vars

    def join(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 0][sorted(left_vars)]
        r = g[g["_side"] == 1][sorted(right_vars)]
        if not len(l) or (how == "inner" and not len(r)):
            return pd.DataFrame({v: pd.Series([], dtype=object)
                                 for v in out_cols})
        if how == "anti":
            if not len(r):
                return l.reset_index(drop=True)[out_cols]
            m = l.merge(r[on].drop_duplicates(), on=on, how="left",
                        indicator=True)
            return m[m["_merge"] == "left_only"][out_cols]
        m = l.merge(r, on=on, how=how)
        out = m[all_vars]
        if how == "left":
            # unmatched OPTIONAL vars surface as None (folded to the
            # 'NULL' sentinel by bgp_bindings_tagged / COALESCE in SQL)
            out = out.astype(object).where(out.notna(), None)
        return out

    return unioned.groupby("_bucket").map_groups(join,
                                                 batch_format="pandas"), \
        set(out_cols)


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
              optional=(), minus=(), values=None, distinct=False,
              num_buckets: int = 32):
    """Evaluate a basic graph pattern; returns a Dataset with one
    string column per selected variable (all variables if ``select``
    is None, sorted by name).

    ``optional`` patterns are SPARQL OPTIONAL: each is LEFT-joined
    against the required bindings after all required patterns, so
    solutions survive with ``None`` for the optional variables when
    the pattern has no match.  Optional patterns must join on
    required-bound variables (join keys can't themselves be nullable),
    and ``filters`` may reference required variables only — the two
    standard restrictions that keep left-join semantics unambiguous.

    ``minus`` is SPARQL MINUS / FILTER NOT EXISTS: the pattern list is
    evaluated as its own BGP and required solutions are ANTI-joined
    away on the shared variables (broadcast key set under the cap,
    bucket-hash anti-join above).  MINUS applies before OPTIONAL.

    ``values`` is SPARQL VALUES for single variables: {"?v": [...]}
    constrains each named variable to the listed constants — applied
    as a broadcast set-membership filter the moment the variable
    binds, so it prunes BEFORE the joins, like VALUES should.

    ``distinct=True`` is SELECT DISTINCT: one bucket-hash dedup of the
    projected solution rows (multiset semantics otherwise)."""
    if not patterns:
        raise ValueError("empty BGP")
    values = dict(values or {})
    for v in values:
        if not _is_var(v):
            raise ValueError(f"VALUES key must be a ?variable: {v!r}")

    def apply_values(ds, bound, pending):
        ready = [v for v in pending if v[1:] in bound]
        if not ready:
            return ds, pending
        sets = {v[1:]: frozenset(map(str, values[v])) for v in ready}

        def f(df: pd.DataFrame) -> pd.DataFrame:
            m = np.ones(len(df), dtype=bool)
            for var, allowed in sets.items():
                m &= df[var].astype(str).isin(allowed).to_numpy()
            return df[m]

        return ds.map_batches(f, batch_format="pandas"), \
            [v for v in pending if v not in ready]
    scans = []
    for pat in patterns:
        if len(pat) != 3:
            raise ValueError(f"pattern must be (s, p, o): {pat!r}")
        # materialize each pattern scan once: the join needs the whole
        # binding table anyway, and the known row count drives the
        # broadcast-vs-shuffle choice per join
        ds, vars_ = _scan_pattern(triples_ds, pat)
        ds = ds.materialize()
        scans.append(((ds, vars_, ds.count()),
                      sum(0 if _is_var(t) else 1 for t in pat)))

    def joined(cur, bound, cur_n, rds, rvars, r_n, how="inner"):
        """Pick the join strategy: broadcast the small side when one
        fits under BGP_BROADCAST_ROWS (for how='left' only the right
        side may broadcast — left rows must all survive), else the
        bucket-hash shuffle join."""
        if r_n <= BGP_BROADCAST_ROWS:
            out, b = _broadcast_join(cur, bound, rds, rvars, how)
        elif how == "inner" and cur_n <= BGP_BROADCAST_ROWS:
            out, b = _broadcast_join(rds, rvars, cur, bound, how)
        else:
            out, b = _equijoin(cur, bound, rds, rvars, num_buckets,
                               how=how)
        out = out.materialize()
        return out, b, out.count()

    # greedy plan: most constants first, then connected patterns only
    order = sorted(range(len(scans)),
                   key=lambda i: (-scans[i][1], i))
    first = order[0]
    cur, bound, cur_n = scans[first][0]
    remaining = [i for i in order if i != first]
    applied: set = set()
    pending_values = list(values)
    cur, applied = _apply_filters(cur, bound, filters, applied)
    cur, pending_values = apply_values(cur, bound, pending_values)
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
        rds, rvars, r_n = scans[nxt][0]
        cur, bound, cur_n = joined(cur, bound, cur_n, rds, rvars, r_n)
        remaining.remove(nxt)
        cur, applied = _apply_filters(cur, bound, filters, applied)
        cur, pending_values = apply_values(cur, bound, pending_values)
    if pending_values:
        raise ValueError(
            f"VALUES references unbound variable(s): {pending_values}")
    if len(applied) != len(filters):
        missing = [filters[i] for i in range(len(filters))
                   if i not in applied]
        raise ValueError(f"filter references unbound variable: {missing}")
    required_bound = set(bound)
    if minus:
        mvars = {t[1:] for pat in minus for t in pat if _is_var(t)}
        shared = mvars & required_bound
        if not shared:
            raise ValueError(
                "MINUS pattern shares no variable with the required "
                f"BGP (it would remove nothing): {minus!r}")
        mds = match_bgp(triples_ds, minus,
                        select=["?" + v for v in sorted(shared)],
                        num_buckets=num_buckets).materialize()
        cur, bound, cur_n = joined(cur, bound, cur_n, mds, shared,
                                   mds.count(), how="anti")
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
        rds = rds.materialize()
        cur, bound, cur_n = joined(cur, bound, cur_n, rds, rvars,
                                   rds.count(), how="left")
    keep = sorted(bound) if select is None \
        else [v[1:] for v in select]
    for v in keep:
        if v not in bound:
            raise ValueError(f"selected variable ?{v} not bound by the BGP")

    def project(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keep].astype(object)
        return out.where(out.notna(), None)

    out = cur.map_batches(project, batch_format="pandas")
    if not distinct:
        return out

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        df["_bucket"] = _bucket_hash(df, keep, num_buckets) \
            if len(df) else np.array([], dtype=np.int32)
        return df

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(keep_cols).drop(columns="_bucket")

    keep_cols = list(keep)
    return out.map_batches(bucket, batch_format="pandas") \
        .groupby("_bucket").map_groups(uniq, batch_format="pandas")


def bgp_bindings_tagged(triples_ds, name: str, patterns, select=None,
                        filters=(), optional=(), minus=(),
                        num_buckets: int = 32):
    """Run a BGP and fold each solution into ONE canonical string
    ``?a=v1|?b=v2`` (variables sorted by name, unmatched OPTIONAL
    variables as the ``NULL`` sentinel — COALESCE in the SQL mirror)
    so BGPs of different shapes can share a tagged union slot:
    output (q, binding)."""
    ds = match_bgp(triples_ds, patterns, select=select, filters=filters,
                   optional=optional, minus=minus, num_buckets=num_buckets)

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


def property_path_closure(triples_ds, predicate: str,
                          num_buckets: int = 32, max_rounds: int = 20):
    """SPARQL property path ``pred+``: the transitive closure of one
    predicate's edge set, as a Dataset of DISTINCT (start, end) string
    pairs.

    Iterative squaring: round k holds every path of length <= 2^k, so
    a closure of diameter D converges in ceil(log2(D)) rounds — the
    same doubling trade as the SKOS broader-cycle detector
    (stages/skos_ops.py), generalized to non-functional graphs.  Each
    round is one bucket-hash equijoin (cur.end = cur.start) plus a
    bucket-hash distinct; the driver sees only the per-round pair
    COUNT for the fixpoint test.  The working set is the closure
    itself (its size is the honest bound — a dense relation's closure
    is quadratic no matter the engine); edges ship as 2 string
    columns throughout.
    """
    import pyarrow as pa

    pre_filtered = isinstance(triples_ds, str)
    if pre_filtered:
        # prune at the read: only matching row groups and only the
        # two needed columns leave storage; a pred_part hive store
        # narrows to its partition directory (whole-file pruning)
        import os

        import pyarrow.dataset as pads
        import ray.data as rd

        cand = os.path.join(
            triples_ds, f"pred_part={predicate_partition_key(predicate)}")
        triples_ds = rd.read_parquet(
            cand if os.path.isdir(cand) else triples_ds,
            columns=["subject", "object"],
            filter=pads.field("predicate") == predicate)

    def edges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        f = t if pre_filtered \
            else t.filter(pc.equal(t["predicate"], predicate))
        return pa.table({"s": f["subject"].cast(pa.string()),
                         "e": f["object"].cast(pa.string())})

    def dedup_pairs(ds):
        def bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_bucket"] = _bucket_hash(df, ["s", "e"], num_buckets) \
                if len(df) else np.array([], dtype=np.int32)
            return df

        def uniq(g: pd.DataFrame) -> pd.DataFrame:
            return g.drop_duplicates(["s", "e"])[["s", "e"]]

        return ds.map_batches(bucket, batch_format="pandas") \
            .groupby("_bucket").map_groups(uniq, batch_format="pandas")

    cur = dedup_pairs(
        triples_ds.map_batches(edges, batch_format="pyarrow")) \
        .materialize()
    n = cur.count()
    if n == 0:
        return cur
    for _ in range(max_rounds):
        # R ∘ R through the generic binding join: rename so the join
        # key is the shared variable m (left end = right start)
        left = cur.map_batches(
            lambda df: df.rename(columns={"e": "m"}),
            batch_format="pandas")
        right = cur.map_batches(
            lambda df: df.rename(columns={"s": "m", "e": "e2"}),
            batch_format="pandas")
        joined, _ = _equijoin(left, {"s", "m"}, right, {"m", "e2"},
                              num_buckets)
        new = joined.map_batches(
            lambda df: df[["s", "e2"]].rename(columns={"e2": "e"}),
            batch_format="pandas")
        cur = dedup_pairs(cur.union(new)).materialize()
        n2 = cur.count()
        if n2 == n:
            break
        n = n2
    else:
        raise ValueError(
            f"property_path_closure did not converge in {max_rounds} "
            f"doubling rounds (diameter > 2^{max_rounds})")
    return cur


def bgp_group_count(triples_ds, name: str, patterns, by: str,
                    select=None, filters=(), optional=(), minus=(),
                    num_buckets: int = 32):
    """SPARQL aggregation over a BGP: ``SELECT ?by (COUNT(*) AS ?n)
    WHERE {...} GROUP BY ?by`` — the solution multiset grouped on one
    variable.  Returns (q, binding) rows with the count folded in as
    a pseudo-variable ``?n`` so the leg can ride the tagged slot."""
    from ray.data.aggregate import Count

    ds = match_bgp(triples_ds, patterns, select=select, filters=filters,
                   optional=optional, minus=minus,
                   num_buckets=num_buckets)
    var = by[1:]
    counts = ds.groupby(var).aggregate(Count(alias_name="n"))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"q": pd.Series([], dtype=object),
                                 "binding": pd.Series([], dtype=object)})
        s = ("?" + var + "=" + df[var].astype(str)
             + "|?n=" + df["n"].astype(np.int64).astype(str))
        return pd.DataFrame({"q": np.full(len(df), name, dtype=object),
                             "binding": s.to_numpy()})

    return counts.map_batches(fold, batch_format="pandas")


def construct_triples(triples_ds, patterns, template, select=None,
                      filters=(), optional=(), minus=(),
                      num_buckets: int = 32):
    """SPARQL CONSTRUCT: evaluate the BGP, then instantiate one
    ``template`` triple (s, p, o) per solution — terms are either
    ``?var`` references or constants.  The rule-based enrichment
    primitive: e.g. CONSTRUCT { ?a kg:coMentionedWith ?b } WHERE
    { ?t kg:mentions ?a . ?t kg:mentions ?b . FILTER(?a < ?b) }.

    Output is full triple-store schema (subject, predicate, object,
    object_kind, lang, datatype) with object_kind derived by the
    http-prefix heuristic the reference uses for hasValue literals
    (ontology_manager.py:1119-1122), so the result unions directly
    into the store and feeds every downstream stage (dedup,
    canonicalize, listings).  DISTINCT semantics (a CONSTRUCTed graph
    is a set): one bucket-hash dedup of the emitted triples."""
    if len(template) != 3:
        raise ValueError(f"template must be (s, p, o): {template!r}")
    tvars = [t[1:] for t in template if _is_var(t)]
    sel = select
    if sel is None:
        sel = ["?" + v for v in dict.fromkeys(tvars)]
    ds = match_bgp(triples_ds, patterns, select=sel, filters=filters,
                   optional=optional, minus=minus,
                   num_buckets=num_buckets)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        cols = {}
        for name, term in zip(("subject", "predicate", "object"),
                              template):
            if _is_var(term):
                cols[name] = df[term[1:]].astype(str)
            else:
                cols[name] = pd.Series([term] * len(df), dtype=object)
        obj = cols["object"]
        kind = np.where(obj.str.startswith("http"), "uri", "literal")
        return pd.DataFrame({
            "subject": cols["subject"],
            "predicate": cols["predicate"],
            "object": obj,
            "object_kind": pd.Series(kind, dtype=object),
            "lang": pd.Series([""] * len(df), dtype=object),
            "datatype": pd.Series([""] * len(df), dtype=object),
        })

    emitted = ds.map_batches(emit, batch_format="pandas")

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        df["_bucket"] = _bucket_hash(
            df, ["subject", "predicate", "object"], num_buckets) \
            if len(df) else np.array([], dtype=np.int32)
        return df

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["subject", "predicate", "object"]) \
            .drop(columns="_bucket")

    return emitted.map_batches(bucket, batch_format="pandas") \
        .groupby("_bucket").map_groups(uniq, batch_format="pandas")


def predicate_partition_key(uri: str) -> str:
    """Sanitized predicate local name, safe as a hive directory value
    (non-alphanumerics collapse to '_'; collisions only merge
    partitions, never lose rows — the full predicate column is still
    stored and still filtered)."""
    import re

    local = uri.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
    return re.sub(r"[^A-Za-z0-9_-]", "_", local) or "_"


def write_store_by_predicate(triples_ds, out_dir: str) -> None:
    """Write a triples store hive-partitioned by predicate local name
    (``pred_part=<key>/`` directories).  Predicates are low-cardinality
    (~tens), so this costs one extra string column at write time and
    buys FILE-level pruning for every BGP pattern with a constant
    predicate: a scan of ``kg:mentions`` reads 1/|predicates| of the
    store instead of row-group-filtering all of it — the layout you
    want when the store is queried more than it is rebuilt."""
    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        df["pred_part"] = df["predicate"].map(predicate_partition_key)
        return df

    triples_ds.map_batches(add_key, batch_format="pandas") \
        .write_parquet(out_dir, partition_cols=["pred_part"])


def ask(source, patterns, filters=(), optional=(), minus=(),
        num_buckets: int = 32) -> bool:
    """SPARQL ASK: does the BGP have at least one solution?  Stops at
    the first block with a row (``limit(1)`` under streaming
    execution) instead of materializing the solution set."""
    ds = match_bgp(source, patterns, filters=filters, optional=optional,
                   minus=minus, num_buckets=num_buckets)
    return bool(ds.limit(1).take(1))


def describe(source, uri: str):
    """SPARQL DESCRIBE: every triple where ``uri`` is the subject or a
    URI object — the per-resource neighborhood view (the reference's
    entity-detail panes compose exactly this).  With a path source,
    two pruned reads (subject-filtered + object-filtered) union; a
    Dataset source scans once."""
    cols = ["subject", "predicate", "object", "object_kind", "lang",
            "datatype"]

    if isinstance(source, str):
        import pyarrow.dataset as pads
        import ray.data as rd

        out_ds = rd.read_parquet(source, columns=cols,
                                 filter=pads.field("subject") == uri)
        inbound = rd.read_parquet(
            source, columns=cols,
            filter=(pads.field("object") == uri)
            & (pads.field("object_kind") == "uri")
            & (pads.field("subject") != uri))
        return out_ds.union(inbound)

    def flt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.or_(pc.equal(t["subject"], uri),
                   pc.and_(pc.equal(t["object"], uri),
                           pc.equal(t["object_kind"], "uri")))
        return t.filter(m).select(cols)

    return source.map_batches(flt, batch_format="pyarrow")


def bgp_topk(source, patterns, order_by: str, k: int = 10,
             descending: bool = False, select=None, filters=(),
             optional=(), minus=(), num_buckets: int = 32):
    """SPARQL ORDER BY ?var LIMIT k over a BGP: per-block local top-k
    partials, then one k x blocks final reduce — the grouped-topk
    combiner shape, so the full solution set never sorts globally.
    Ties break on the remaining columns ascending (deterministic on
    both engines)."""
    var = order_by[1:]
    ds = match_bgp(source, patterns, select=select, filters=filters,
                   optional=optional, minus=minus,
                   num_buckets=num_buckets)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        rest = [c for c in df.columns if c != var]
        return df.sort_values(
            [var] + rest,
            ascending=[not descending] + [True] * len(rest)).head(k)

    return ds.map_batches(local, batch_format="pandas") \
        .repartition(1).map_batches(local, batch_format="pandas")
