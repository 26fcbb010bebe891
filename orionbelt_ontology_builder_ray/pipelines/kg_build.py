"""Flagship pipeline: transcripts → triples (the north_star DAG).

    read transcripts (or derive from events)
      → map_batches(TripleExtractor actors)     stage 1: per-turn triples
                                                + mention candidates
      → map_batches(EntityLinker actors)        stage 2: alias-dict linking
      → canonicalize (groupby + union-find      stage 3: SHUFFLE 1 (only
        + broadcast rewrite)                    when merge pairs exist)
      → exact dedup (hash-bucket shuffle)       stage 4: SHUFFLE 2
      → sort(subject, predicate, object)        stage 5: deterministic
      → write_parquet / return                  materialization

Every stage checkpoints to ``<ckpt>/<stage>`` with lineage manifests
when ``ckpt_dir`` is set; a rerun with the same input fingerprint
resumes after the last complete stage (see ``pipelines.checkpoint``).
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

from ..functions.kg import KG, seed_schema_store
from ..sources.transcripts import derive_transcripts, read_transcripts
from ..stages.canonicalize import canonicalize
from ..stages.dedup import dedup_triples
from ..stages.extract import TRIPLE_COLS, TripleExtractor
from ..stages.link import EntityLinker, build_alias_dict
from . import checkpoint as ckpt


def seed_schema_dataset():
    import ray.data as rd

    return rd.from_arrow(seed_schema_store().to_arrow())


def _fingerprint(*parts) -> str:
    return hashlib.sha1("|".join(str(p) for p in parts).encode()).hexdigest()[:16]


def _strip_hash(ds):
    """Drop the combiner hash column tolerantly (select, not
    drop_columns — lineage replay after object-store eviction can hand
    back a block that never had ``_h``)."""
    return ds.map_batches(
        lambda t: t.select([c for c in TRIPLE_COLS if c in t.column_names]),
        batch_format="pyarrow")


def _input_signature(path) -> str:
    """Content signature of the input files (name/size/mtime), so an
    in-place edit of the input invalidates checkpoints — a path-only
    fingerprint would serve stale stages.  Accepts a path or a list of
    paths (read_parquet takes either)."""
    import glob

    if not path:
        return "none"
    paths = path if isinstance(path, (list, tuple)) else [path]
    files = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(sorted(glob.glob(os.path.join(p, "**", "*"),
                                          recursive=True)))
        else:
            files.append(p)
    sig = []
    for f in files:
        if os.path.isfile(f):
            st = os.stat(f)
            sig.append(f"{os.path.basename(f)}:{st.st_size}:{int(st.st_mtime)}")
    return _fingerprint(*sig)


# Beyond this many estimated triple rows the broadcast dedup's driver
# hash scan (8 B/row) stops being comfortable (~1.6 GB) — auto-select
# switches to the streaming 'scoped' strategy (fused producer
# invariant) or the all-to-all 'shuffle' fallback.
DEDUP_BROADCAST_ROW_LIMIT = 200_000_000
# measured flagship emission rate: ~9.3 triples per transcript turn
TRIPLES_PER_TURN_ESTIMATE = 12


def select_dedup_strategy(estimated_rows: int, fused: bool = True,
                          limit: Optional[int] = None) -> str:
    """Pick the dedup strategy from the input-size estimate
    (VERDICT r1: broadcast must not silently stay the default at
    10^12-row scale)."""
    if limit is None:
        limit = DEDUP_BROADCAST_ROW_LIMIT  # read at call time (testable)
    if estimated_rows <= limit:
        return "broadcast"
    return "scoped" if fused else "shuffle"


def build_kg(sf_dir: Optional[str] = None,
             transcripts_path: Optional[str] = None,
             emit_ts: bool = True,
             include_seed_schema: bool = True,
             canonicalize_labels: bool = False,
             dedup_buckets: int = 32,
             dedup_strategy: str = "auto",
             extract_concurrency: Optional[int] = None,
             link_concurrency: Optional[int] = None,
             batch_size: int = 8192,
             fused: bool = True,
             read_blocks: Optional[int] = None,
             ckpt_dir: Optional[str] = None,
             final_sort: bool = True,
             partition_buckets: Optional[int] = None,
             output_path: Optional[str] = None,
             kernel: str = "arrow",
             store_hashes: bool = False,
             dict_columns: bool = False):
    """Run the flagship KG-construction pipeline; returns the triples
    Dataset (sorted when ``final_sort``).

    ``canonicalize_labels=False`` by default for the oracle-checked
    path (linker output is already canonical); the canonicalization
    stage still runs for explicit sameAs pairs and is exercised with
    variants in tests and the bench.

    ``dict_columns=True`` (opt-in scale representation) keeps the four
    low-cardinality triple columns dictionary-encoded IN FLIGHT —
    int32 codes + tiny per-chunk dictionaries instead of repeated URI
    strings — shrinking object-store and write-path memory traffic on
    the measured single-node bandwidth ceiling (BASELINE.md).  Row
    values and parquet output are unchanged (parquet reads dictionary
    pages back as plain strings).  Supported on the arrow kernel +
    scoped dedup + unsorted/partitioned output (the 100-TB
    configuration); other combinations raise.
    """
    if dict_columns and (kernel != "arrow" or final_sort
                         or canonicalize_labels or store_hashes
                         or not fused):
        raise ValueError(
            "dict_columns=True requires kernel='arrow', fused=True, "
            "final_sort=False, canonicalize_labels=False, "
            "store_hashes=False (the partitioned scale layout)")
    # Default actor-pool sizing follows the SESSION, never exceeds
    # cpus-2: a fixed pool that reserves every CPU starves the
    # ReadParquet/Write task operators and the pipeline hangs (measured
    # on a 4-CPU session; the round-1 autoscaling cliff in new clothes).
    if extract_concurrency is None or link_concurrency is None:
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        pool = max(1, min(16, cpus - 2))
        if extract_concurrency is None:
            extract_concurrency = max(1, (pool + 1) // 2)
        if link_concurrency is None:
            link_concurrency = max(1, pool // 2)

    if transcripts_path:
        # read_blocks bounds the block count through the whole DAG:
        # every downstream stage inherits it, and the hive write emits
        # one file per (block, partition) — many small input files
        # otherwise fan out into tens of thousands of output files and
        # per-block overheads (measured 3x on the full pipeline)
        transcripts = read_transcripts(transcripts_path,
                                       override_num_blocks=read_blocks)
        alias_source = sf_dir
        fp_parts = ("path", transcripts_path,
                    _input_signature(transcripts_path))
    else:
        # Testdata adapter: the real input is a transcripts Parquet table
        # (input_hint shape). Deriving it involves a per-conversation
        # groupby; materialize the small result so that shuffle doesn't
        # sit inside the streaming extract->link->dedup DAG (an upstream
        # all-to-all barrier in the same execution starves the actor
        # pools — measured 14x slower fused).
        transcripts = derive_transcripts(sf_dir).materialize()
        alias_source = sf_dir
        fp_parts = ("derived", sf_dir, _input_signature(sf_dir))

    if dedup_strategy == "auto":
        # transcripts.count() is metadata-cheap (parquet row counts /
        # materialized block counts — no full read)
        dedup_strategy = select_dedup_strategy(
            transcripts.count() * TRIPLES_PER_TURN_ESTIMATE, fused=fused)
    if dict_columns and dedup_strategy != "scoped":
        raise ValueError("dict_columns=True requires the scoped dedup "
                         f"strategy (got {dedup_strategy!r})")

    # The fingerprint must cover every stage-affecting knob AND the
    # input content, not just the path — otherwise re-running into the
    # same ckpt_dir with (say) --canonicalize added, or after editing
    # the input in place, silently serves stale stage output.
    fp = _fingerprint(*fp_parts, emit_ts, include_seed_schema,
                      canonicalize_labels, dedup_strategy, fused)

    # ---- stages 1+2 (single streaming pass over the input) ----
    prehashed = False
    if ckpt.stage_complete(ckpt_dir, "extract_link", fp):
        triples = ckpt.load_stage(ckpt_dir, "extract_link")
    else:
        import ray

        alias_ref = ray.put(build_alias_dict(alias_source))
        if fused:
            # one pool runs extract->link->local-dedup per batch: same
            # semantics, 1/3 the conversions, sized to the whole node.
            # kernel="arrow" (default) computes on zero-copy pyarrow
            # batches — measured 2.7x the pandas kernel per batch
            # (BASELINE.md round-3 A/B); "pandas" kept for A/B and as
            # a fallback, byte-identical output either way.
            from ..stages.link import ExtractLinkFused, ExtractLinkFusedArrow

            scoped = dedup_strategy == "scoped"
            fused_cls = (ExtractLinkFusedArrow if kernel == "arrow"
                         else ExtractLinkFused)
            ctor = dict(alias_ref=alias_ref, emit_ts=emit_ts,
                        with_dedup_hash=not scoped,
                        with_local_dedup=scoped)
            if kernel == "arrow":
                ctor["dict_columns"] = dict_columns
            triples = transcripts.map_batches(
                fused_cls,
                fn_constructor_kwargs=ctor,
                batch_format="pyarrow" if kernel == "arrow" else "pandas",
                batch_size=batch_size,
                concurrency=extract_concurrency + link_concurrency)
            if include_seed_schema:
                seed = seed_schema_dataset()
                if not scoped:
                    from ..stages.dedup import _DedupAndHash

                    seed = seed.map_batches(_DedupAndHash(),
                                            batch_format="pyarrow")
                elif dict_columns:
                    from ..stages.link import encode_dict_cols

                    seed = seed.map_batches(encode_dict_cols,
                                            batch_format="pyarrow")
                triples = triples.union(seed)
            prehashed = not scoped
        else:
            # fused=False is the A/B REFERENCE path, deliberately kept
            # on the pandas kernel: it pins the un-fused two-stage
            # semantics (and the pandas kernel itself) against the
            # default fused arrow pool — converting it to arrow would
            # remove the only independent implementation the
            # byte-identity tests compare against.  Never on the
            # default (fused=True) path.
            triples = transcripts.map_batches(
                TripleExtractor,
                fn_constructor_kwargs=dict(emit_ts=emit_ts),
                batch_format="pandas", batch_size=batch_size,
                concurrency=extract_concurrency)
            triples = triples.map_batches(
                EntityLinker, fn_constructor_kwargs=dict(alias_ref=alias_ref),
                batch_format="pandas", batch_size=batch_size,
                concurrency=link_concurrency)
            if include_seed_schema:
                triples = triples.union(seed_schema_dataset())
        if ckpt_dir:
            triples = ckpt.save_stage(ckpt_dir, "extract_link",
                                      _strip_hash(triples)
                                      if prehashed else triples, fp)
            prehashed = False

    # ---- stage 3: canonicalization ----
    if canonicalize_labels and prehashed:
        triples = _strip_hash(triples)
        prehashed = False
    if canonicalize_labels:
        if ckpt.stage_complete(ckpt_dir, "canonical", fp):
            triples = ckpt.load_stage(ckpt_dir, "canonical")
        else:
            triples, mapping = canonicalize(triples, use_labels=True)
            if ckpt_dir:
                triples = ckpt.save_stage(ckpt_dir, "canonical", triples, fp,
                                          metrics={"merged_entities": len(mapping)})

    # ---- stage 4: exact dedup ----
    if ckpt.stage_complete(ckpt_dir, "dedup", fp):
        triples = ckpt.load_stage(ckpt_dir, "dedup")
    elif dedup_strategy == "scoped":
        # Producer invariant: turn-subject rows (".*-t<idx>") are
        # emitted by exactly one batch, so after the fused per-batch
        # dedup they are globally unique — only conversation / entity /
        # seed rows can repeat across batches.  The stream is consumed
        # twice by the split, so materialize (at 10^12 scale this slot
        # is the extract_link stage checkpoint instead).
        from ..stages.dedup import dedup_triples_scoped

        triples = dedup_triples_scoped(triples.materialize(),
                                       scope_regex="-t[0-9]+$",
                                       pre_deduped=fused,
                                       dict_columns=dict_columns)
        if ckpt_dir:
            triples = ckpt.save_stage(ckpt_dir, "dedup", triples, fp)
    else:
        triples = dedup_triples(triples, num_buckets=dedup_buckets,
                                strategy=dedup_strategy, prehashed=prehashed)
        if ckpt_dir:
            triples = ckpt.save_stage(ckpt_dir, "dedup", triples, fp)

    # ---- stage 5: deterministic materialization ----
    # Two layouts:
    # - final_sort: one globally (s,p,o)-sorted dataset — right for
    #   small/oracle outputs; a total sort of 10^12 rows is pointless.
    # - partition_buckets: content-based layout — partition key =
    #   hash(subject) % B computed per row (NO all-to-all; co-locates
    #   each entity's triples), written as one parquet directory per
    #   bucket, rows sorted within each written block.  Resumable:
    #   a re-run reproduces the same bucket dirs.
    # store_hashes: persist the 128-bit content-hash pair as two int64
    # store columns (16 B/row on disk) so incremental ingest
    # (update_kg) probes the store by READING 2 pruned columns instead
    # of re-hashing the full payload — the exabyte-store layout named
    # in the update_kg docstring.
    if store_hashes and output_path:
        triples = triples.map_batches(_add_hash_cols, batch_format="pandas")

    if partition_buckets:
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        nb = partition_buckets

        def add_part(t: pa.Table) -> pa.Table:
            # arrow-native: box ONLY the subject column for the pandas
            # hash (part is a layout key; the hash just has to be
            # deterministic) — the previous pandas-format stage boxed
            # all six string columns of the full output, the single
            # biggest memory-traffic hop in the write phase
            h = pd.util.hash_pandas_object(
                t["subject"].to_pandas(), index=False).to_numpy()
            return t.append_column(
                "part", pa.array((h % nb).astype(np.int32)))

        # every block fans out into one file PER partition value, so
        # block count × buckets is the output file count; when the read
        # wasn't already coalesced (read_blocks), repartition here
        if read_blocks is None:
            try:
                import ray

                n_cpus = int(ray.cluster_resources().get("CPU", 16))
            except Exception:
                n_cpus = 16
            triples = triples.repartition(max(16, n_cpus * 2))
        triples = triples.map_batches(add_part, batch_format="pyarrow")
        if output_path:
            triples.write_parquet(output_path, partition_cols=["part"])
        return triples
    if final_sort:
        triples = triples.sort(["subject", "predicate", "object"])
    if output_path:
        triples.write_parquet(output_path)
    return triples


def _hashed_schema():
    import pyarrow as pa

    return pa.schema([(c, pa.string()) for c in TRIPLE_COLS]
                     + [("_h1", pa.int64()), ("_h2", pa.int64())])


def _add_hash_cols(batch):
    """Append the collision-safe 128-bit content-hash pair (two
    independent int64 hashes) of the 6-column triple identity.

    Hashing stays pandas (`hash_pandas_object` — the store-probe side
    must reproduce these bit-for-bit), but the RETURN is an arrow
    table with a pinned schema: downstream consumers (q collect,
    fresh filter, parquet write) then read the materialized delta
    zero-copy, and 0-row batches keep typed string columns instead of
    pandas object columns (whose 0-row size estimation logs errors)."""
    import pyarrow as pa

    from ..stages.graph_ops import _row_hashes

    batch = batch[[c for c in TRIPLE_COLS if c in batch.columns]] \
        .reindex(columns=TRIPLE_COLS, fill_value="")
    h = _row_hashes(batch)
    batch = batch.copy()
    batch["_h1"] = h["h1"]
    batch["_h2"] = h["h2"]
    return pa.Table.from_pandas(batch, schema=_hashed_schema(),
                                preserve_index=False)


def _pair_index(h1, h2) -> dict:
    """Sorted membership index over 128-bit hash PAIRS using only plain
    int64 numpy ops.

    Structured-dtype ``np.sort``/``searchsorted`` are comparison-based
    (measured 20 s to sort 3.7M pairs); instead the pairs are sorted by
    ``h1`` alone with numpy's stable integer argsort (radix — measured
    2.6x faster than ``np.lexsort``'s two merge passes on 3.7M rows)
    into two parallel int64 arrays.  Within an equal-``h1`` run the
    ``h2`` order is irrelevant: lookups on duplicated ``h1`` keys go
    through the exact side table, which records positions from the
    final arrays.  The fast path treats ``s1`` (the leading 64-bit
    hash) as unique — among n 64-bit hashes the expected duplicate
    count is ~n^2/2^65, i.e. ~0 below billions of rows — and the rare
    duplicated-h1 groups are carried in the side table so membership
    stays collision-safe in all cases."""
    import numpy as np

    h1 = np.asarray(h1, dtype=np.int64)
    h2 = np.asarray(h2, dtype=np.int64)
    order = np.argsort(h1, kind="stable")
    s1, s2 = np.ascontiguousarray(h1[order]), np.ascontiguousarray(h2[order])
    return {"s1": s1, "s2": s2, **_dup_side_table(s1, s2)}


def _dup_side_table(s1, s2) -> dict:
    import numpy as np

    dup_pos: dict = {}
    dup_keys = np.empty(0, dtype=np.int64)
    if len(s1) > 1:
        d = s1[1:] == s1[:-1]
        if d.any():
            dm = np.zeros(len(s1), dtype=bool)
            dm[1:] = d
            dm[:-1] |= d
            dup_keys = np.unique(s1[dm])
            idxs = np.flatnonzero(dm)
            for i in idxs.tolist():
                dup_pos.setdefault((int(s1[i]), int(s2[i])), i)
    return {"dup_keys": dup_keys, "dup_pos": dup_pos}


def _subset_index(idx: dict, mask) -> dict:
    """Index restricted to ``mask`` over its sorted arrays — order is
    inherited, only the duplicate side table is rebuilt (cheap)."""
    s1, s2 = idx["s1"][mask], idx["s2"][mask]
    return {"s1": s1, "s2": s2, **_dup_side_table(s1, s2)}


def _pair_positions(idx: dict, a, b):
    """(mask, pos): mask[i] = pair (a[i], b[i]) is in the index, and
    pos[i] = its position in the sorted arrays (valid where mask)."""
    import numpy as np

    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    s1, s2 = idx["s1"], idx["s2"]
    if not len(s1):
        z = np.zeros(len(a), dtype=bool)
        return z, np.zeros(len(a), dtype=np.int64)
    i = np.searchsorted(s1, a)
    i[i >= len(s1)] = len(s1) - 1
    m = (s1[i] == a) & (s2[i] == b)
    if len(idx["dup_keys"]):
        # exact re-check for queries landing on a duplicated h1 (with
        # side="left", s2[i] is only the group's smallest member)
        dq = np.isin(a, idx["dup_keys"])
        if dq.any():
            pos_map = idx["dup_pos"]
            sub = [pos_map.get((x, y), -1)
                   for x, y in zip(a[dq].tolist(), b[dq].tolist())]
            sub = np.asarray(sub, dtype=np.int64)
            m[dq] = sub >= 0
            i[dq] = np.where(sub >= 0, sub, 0)
    return m, i


def _pair_member(idx: dict, a, b):
    """Vectorized bool mask: is each (a[i], b[i]) pair in the index?"""
    return _pair_positions(idx, a, b)[0]


def update_kg(existing_path: str,
              sf_dir: Optional[str] = None,
              transcripts_path: Optional[str] = None,
              output_path: Optional[str] = None,
              **build_kwargs):
    """Incremental ingest: extract/link NEW transcripts, anti-join
    against the EXISTING triples store, and return the added triples.

    Continuous-ingestion shape for the 100-TB target:

    - the existing store's *payload never moves* — per batch it is
      reduced to its 128-bit content-hash pair (two independent 64-bit
      hashes so a collision cannot silently drop a genuinely-new
      triple) and probed in place;
    - ``output_path`` appends the additions as their own parquet
      directory — the store stays an append-only family of runs, so a
      failed ingest re-runs without touching prior data.

    The reference has no incremental path at all (every import re-walks
    the whole in-memory graph); this is engine-native functionality.

    Physical shape (round-3 redesign — ZERO shuffle; the first cut
    bucket-joined payload-carrying hash streams through a Ray groupby
    and, fused into the same streaming execution as the extract actor
    pools, hit the measured shuffle-upstream-of-actors serialization
    cliff — the anti-join alone cost ~11 s at sf0.1; this shape costs
    ~3 s):

    1. the NEW delta is materialized once (it is the incremental batch
       — bounded by ingest size, never by store size) and its 128-bit
       content-hash pairs are collected and broadcast (``ray.put``)
       as ONE sorted numpy array Q;
    2. the EXISTING store streams through a probe pass — per batch,
       hash the rows (vectorized) and emit only the members of Q that
       are present (16 B/hit, bounded by |Q|, tiny for real ingest
       where the delta barely overlaps the store);
    3. fresh = Q minus hits (driver setdiff over sorted arrays), and
       the materialized delta is filtered per batch by vectorized
       searchsorted membership against the broadcast fresh set.

    The store's payload never crosses the wire and there is no
    all-to-all anywhere: the only data movement is the Q broadcast
    (16 B per delta row — ~60 MB per 3.7M candidate additions) and
    the hit stream back.  Documented boundary: a single run's DELTA
    hash set must fit the object store, i.e. additions up to the low
    billions per run; beyond that, split the ingest (the store is
    append-only anyway).  Upgrade path for exabyte stores: persist
    ``_h1/_h2`` as store columns so the probe pass reads 16 B/row
    instead of hashing payload.
    """
    import time

    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    from ..stages.graph_ops import _row_hashes

    _prof = os.environ.get("GRAFT_UPDATE_PROFILE")
    _t = time.time()

    def _mark(phase: str) -> None:
        nonlocal _t
        if _prof:
            now = time.time()
            print(f"[update_kg] {phase}: {now - _t:.2f}s", flush=True)
            _t = now

    # materialize ONCE, with the hash pair attached — the delta is
    # hashed a single time and both the q collection and the final
    # filter reuse the columns
    new_hashed = build_kg(sf_dir=sf_dir, transcripts_path=transcripts_path,
                          final_sort=False, **build_kwargs) \
        .map_batches(_add_hash_cols, batch_format="pandas").materialize()
    _mark("build+hash+materialize")
    # collect the q hash pairs arrow-native: per-block zero-copy int64
    # chunks concatenated once (`.to_pandas()` here paid a pandas
    # block-consolidation pass over the full delta — measured 3-4x the
    # cost of the raw 16 B/row fetch)
    q_tables = ray.get(
        new_hashed.select_columns(["_h1", "_h2"]).to_arrow_refs())

    def _col(name):
        # tolerate both block kinds: Ray 2.49's to_arrow_refs hands
        # back the underlying block, which a Project stage can leave
        # as a pandas block
        chunks = []
        for t in q_tables:
            if hasattr(t, "column"):  # pyarrow.Table
                if t.num_rows:
                    chunks.extend(c.to_numpy(zero_copy_only=False)
                                  for c in t.column(name).chunks)
            elif len(t):  # pandas.DataFrame
                chunks.append(t[name].to_numpy())
        return (np.concatenate(chunks) if chunks
                else np.empty(0, dtype=np.int64))

    _mark("q collect")
    q_idx = _pair_index(_col("_h1"), _col("_h2"))
    _mark("q index")
    # broadcast PLAIN int64 arrays: plasma zero-copies plain numeric
    # ndarrays (structured dtypes pickle — a per-task deserialization
    # of the full hash set was measured pathological, ~60 MB copied per
    # batch; structured np.sort/searchsorted are comparison-based and
    # were ALSO pathological: 20 s to sort 3.7M pairs vs 0.5 s lexsort)
    q_ref = ray.put(q_idx)

    import pyarrow as pa

    def probe_store(batch: "pa.Table") -> "pa.Table":
        # arrow in (zero-copy from the parquet read): a hash-carrying
        # store probes via two zero-copy int64 column views and never
        # builds a pandas frame; a plain store converts the payload to
        # pandas ONLY to reproduce the `hash_pandas_object` bits (the
        # same conversion the pandas batch_format would have done).
        q = ray.get(q_ref)  # zero-copy reads for the member arrays
        names = batch.schema.names
        if not len(q["s1"]) or not batch.num_rows:
            return pa.table({"_qi": pa.array([], type=pa.int64())})
        if "_h1" in names:  # hash-carrying store layout
            a = batch.column("_h1").to_numpy(zero_copy_only=False)
            b = batch.column("_h2").to_numpy(zero_copy_only=False)
        else:
            df = batch.select([c for c in TRIPLE_COLS if c in names]) \
                .to_pandas()
            h = _row_hashes(df.reindex(columns=TRIPLE_COLS,
                                       fill_value=""))
            a, b = h["h1"], h["h2"]
        m, pos = _pair_positions(q, a, b)
        return pa.table({"_qi": pa.array(pos[m], type=pa.int64())})

    # coalesce the store read: hive stores fragment into thousands of
    # tiny row groups and the probe pays a fixed per-batch cost.  A
    # store written with build_kg(store_hashes=True) carries its hash
    # pair as columns — the probe then READS 16 B/row (column-pruned)
    # instead of re-hashing payload.
    import pyarrow.dataset as pads

    store_schema = pads.dataset(existing_path).schema.names
    probe_cols = (["_h1", "_h2"]
                  if "_h1" in store_schema and "_h2" in store_schema
                  else None)
    existing = rd.read_parquet(existing_path, columns=probe_cols,
                               override_num_blocks=64)
    hit_tables = ray.get(
        existing.map_batches(probe_store, batch_format="pyarrow",
                             batch_size=65536).to_arrow_refs())
    hit_chunks = [c.to_numpy(zero_copy_only=False)
                  for t in hit_tables
                  if hasattr(t, "num_rows") and t.num_rows
                  for c in t.column("_qi").chunks] \
        + [t["_qi"].to_numpy() for t in hit_tables
           if not hasattr(t, "num_rows") and len(t)]
    hit_qi = (np.concatenate(hit_chunks) if hit_chunks
              else np.empty(0, dtype=np.int64))
    _mark("store probe")
    # fresh = sorted-q positions never hit — an O(n) scatter; the kept
    # arrays inherit sorted order, so no second index build is needed
    hit_mask = np.zeros(len(q_idx["s1"]), dtype=bool)
    if len(hit_qi):
        hit_mask[hit_qi] = True
    keep_ref = ray.put(_subset_index(q_idx, ~hit_mask))

    import pyarrow as pa

    def filter_fresh(batch: "pa.Table") -> "pa.Table":
        # plain task (not an actor pool): ray.get of plain numpy arrays
        # is a zero-copy plasma read (see q_ref note above).  The hash
        # pair was attached before materialization — no re-hash here.
        # Arrow in, arrow out: the delta blocks are arrow (see
        # _add_hash_cols), the filter is a zero-copy mask, and 0-hit
        # batches come out as TYPED empty string columns — schema-
        # stable, so no pandas 0-row size-estimator errors and no
        # mixed-schema executor warnings.
        keep = ray.get(keep_ref)
        if not len(keep["s1"]) or not batch.num_rows:
            return batch.select(TRIPLE_COLS).slice(0, 0)
        m = _pair_member(keep, batch.column("_h1").to_numpy(),
                         batch.column("_h2").to_numpy())
        return batch.select(TRIPLE_COLS).filter(pa.array(m))

    added = new_hashed.map_batches(filter_fresh, batch_format="pyarrow")
    if output_path:
        added = added.materialize()
        added.write_parquet(output_path)
    _mark("fresh filter (lazy)" if not output_path else "fresh filter+write")
    return added
