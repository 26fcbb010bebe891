"""Ray data-plane tests: extraction, linking, dedup, canonicalization,
flagship pipeline, checkpoint resume (one Ray session per pytest run)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from orionbelt_ontology_builder_ray.functions.kg import (
    KG, KG_MENTIONS, KG_PLACE, KG_TURN, KG_USED_TOOL,
)
from orionbelt_ontology_builder_ray.functions.terms import RDF_TYPE, SKOS_PREF_LABEL
from orionbelt_ontology_builder_ray.stages.extract import (
    MENTION_KIND, TRIPLE_COLS, TripleExtractor,
)
from orionbelt_ontology_builder_ray.stages.link import EntityLinker

SF = "/root/testdata/sf0.001"


def tiny_transcripts() -> pd.DataFrame:
    return pd.DataFrame({
        "conv_id": ["conv-000001", "conv-000001", "conv-000002"],
        "turn_idx": np.array([0, 1, 0], dtype=np.int32),
        "role": ["user", "tool", "assistant"],
        "text": ["hello about [NATION_1] ok", "ran with [NATION_1] in [EUROPE]",
                 "no mentions here"],
        "tool": ["", "tool-3", ""],
        "ts": pd.to_datetime(["2024-01-01 00:00:00.000001"] * 3),
    })


ALIAS = {
    "nation_1": (KG + "place-nation_1", KG_PLACE, "NATION_1"),
    "europe": (KG + "region-europe", KG + "Region", "EUROPE"),
}


def test_extractor_structural_triples():
    out = TripleExtractor(emit_ts=False)(tiny_transcripts())
    assert list(out.columns) == TRIPLE_COLS
    turn0 = KG + "conv-000001-t0"
    rows = set(map(tuple, out.to_numpy()))
    assert (turn0, RDF_TYPE, KG_TURN, "uri", "", "") in rows
    assert (turn0, KG + "inConversation", KG + "conv-000001", "uri", "", "") in rows
    assert (turn0, KG + "role", "user", "literal", "", "") in rows
    assert (turn0, KG + "turnIndex", "0", "literal", "",
            "http://www.w3.org/2001/XMLSchema#integer") in rows
    # tool triples only for the tool turn
    assert (KG + "conv-000001-t1", KG_USED_TOOL, KG + "tool-3",
            "uri", "", "") in rows
    assert (KG + "tool-3", RDF_TYPE, KG + "Tool", "uri", "", "") in rows


def test_extractor_mention_candidates():
    out = TripleExtractor(emit_ts=False)(tiny_transcripts())
    mentions = out[out.object_kind == MENTION_KIND]
    got = set(zip(mentions.subject, mentions.object))
    assert (KG + "conv-000001-t0", "NATION_1") in got
    assert (KG + "conv-000001-t1", "NATION_1") in got
    assert (KG + "conv-000001-t1", "EUROPE") in got
    assert len(mentions) == 3


def test_extractor_ts_literals():
    out = TripleExtractor(emit_ts=True)(tiny_transcripts())
    ts_rows = out[out.predicate == KG + "atTime"]
    assert set(ts_rows.object) == {"2024-01-01T00:00:00.000001"}
    assert set(ts_rows.datatype) == {"http://www.w3.org/2001/XMLSchema#dateTime"}


def test_linker_resolves_and_drops():
    extracted = TripleExtractor(emit_ts=False)(tiny_transcripts())
    linked = EntityLinker(ALIAS)(extracted)
    assert not (linked.object_kind == MENTION_KIND).any()
    rows = set(map(tuple, linked.to_numpy()))
    assert (KG + "conv-000001-t0", KG_MENTIONS, KG + "place-nation_1",
            "uri", "", "") in rows
    assert (KG + "place-nation_1", RDF_TYPE, KG_PLACE, "uri", "", "") in rows
    assert (KG + "place-nation_1", SKOS_PREF_LABEL, "NATION_1",
            "literal", "", "") in rows


def test_linker_nil_mentions_dropped():
    extracted = TripleExtractor(emit_ts=False)(
        tiny_transcripts().assign(text=["[UNKNOWN_THING] x", "y", "z"]))
    linked = EntityLinker(ALIAS)(extracted)
    assert not (linked.object_kind == MENTION_KIND).any()
    uri_rows = linked[linked.object_kind == "uri"]
    assert not uri_rows.object.str.contains("UNKNOWN_THING").any()


def test_dedup_triples(ray_session):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import dedup_triples

    df = pd.DataFrame({
        "subject": ["s1"] * 4 + ["s2"],
        "predicate": ["p"] * 5,
        "object": ["o", "o", "o2", "o", "o"],
        "object_kind": ["uri"] * 5,
        "lang": [""] * 5,
        "datatype": ["", "", "", "", ""],
    })
    out = dedup_triples(rd.from_pandas(df), num_buckets=4).to_pandas()
    assert len(out) == 3
    assert set(map(tuple, out.to_numpy())) == {
        ("s1", "p", "o", "uri", "", ""),
        ("s1", "p", "o2", "uri", "", ""),
        ("s2", "p", "o", "uri", "", ""),
    }


def test_dedup_respects_lang_datatype(ray_session):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import dedup_triples

    df = pd.DataFrame({
        "subject": ["s"] * 3, "predicate": ["p"] * 3, "object": ["x"] * 3,
        "object_kind": ["literal"] * 3,
        "lang": ["", "en", ""],
        "datatype": ["", "", "http://www.w3.org/2001/XMLSchema#string"],
    })
    out = dedup_triples(rd.from_pandas(df), num_buckets=2).to_pandas()
    assert len(out) == 3  # lang/datatype are part of identity


def test_canonicalize_merges_label_variants(ray_session):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.canonicalize import canonicalize

    df = pd.DataFrame({
        "subject": ["e/a", "e/b", "t1", "t2"],
        "predicate": [SKOS_PREF_LABEL, SKOS_PREF_LABEL, KG_MENTIONS, KG_MENTIONS],
        "object": ["ACME Corp.", "acme corp", "e/a", "e/b"],
        "object_kind": ["literal", "literal", "uri", "uri"],
        "lang": [""] * 4, "datatype": [""] * 4,
    })
    out, mapping = canonicalize(rd.from_pandas(df))
    assert mapping == {"e/b": "e/a"}
    rows = out.to_pandas()
    # both mention rows now point at the canonical entity
    assert set(rows[rows.predicate == KG_MENTIONS].object) == {"e/a"}
    assert set(rows[rows.predicate == SKOS_PREF_LABEL].subject) == {"e/a"}


def test_canonicalize_sameas_transitive(ray_session):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.canonicalize import (
        canonicalize, union_find_canonical_map,
    )
    from orionbelt_ontology_builder_ray.functions.terms import OWL_SAME_AS

    assert union_find_canonical_map([("b", "c"), ("a", "b")]) == {
        "b": "a", "c": "a"}
    df = pd.DataFrame({
        "subject": ["x", "y"],
        "predicate": [OWL_SAME_AS, OWL_SAME_AS],
        "object": ["y", "z"],
        "object_kind": ["uri", "uri"],
        "lang": ["", ""], "datatype": ["", ""],
    })
    out, mapping = canonicalize(rd.from_pandas(df), use_labels=False)
    assert mapping == {"y": "x", "z": "x"}


def test_flagship_pipeline_sf0001(ray_session):
    from orionbelt_ontology_builder_ray.pipelines.kg_build import build_kg

    ds = build_kg(SF, final_sort=True)
    df = ds.to_pandas()
    assert list(df.columns) == TRIPLE_COLS
    # exact dedup: no duplicate 6-tuples
    assert not df.duplicated().any()
    # sorted deterministically
    assert (df["subject"].is_monotonic_increasing
            or df.sort_values(TRIPLE_COLS[:3]).subject.equals(df.subject))
    # every turn present: 1000 events -> 1000 turn individuals
    turn_rows = df[(df.predicate == RDF_TYPE) & (df.object == KG_TURN)]
    assert len(turn_rows) == 1000
    # mentions resolved against the dimension aliases
    mention_rows = df[df.predicate == KG_MENTIONS]
    assert len(mention_rows) == 2000  # one place + one region per turn
    assert mention_rows.object.str.startswith(KG).all()


def test_flagship_deterministic(ray_session):
    from orionbelt_ontology_builder_ray.pipelines.kg_build import build_kg

    a = build_kg(SF, final_sort=True).to_pandas()
    b = build_kg(SF, final_sort=True).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_checkpoint_resume(ray_session, tmp_path):
    from orionbelt_ontology_builder_ray.pipelines import checkpoint as ckpt
    from orionbelt_ontology_builder_ray.pipelines.kg_build import build_kg

    ck = str(tmp_path / "ckpt")
    a = build_kg(SF, ckpt_dir=ck, final_sort=False).to_pandas()
    m = ckpt.read_manifest(ck, "extract_link")
    assert m and m["complete"] and m["rows"] > 0
    assert ckpt.read_manifest(ck, "dedup")["complete"]
    # resume: stages load from the snapshot (same fingerprint)
    b = build_kg(SF, ckpt_dir=ck, final_sort=False).to_pandas()
    assert sorted(map(tuple, a.to_numpy())) == sorted(map(tuple, b.to_numpy()))
    # different fingerprint -> stale checkpoint ignored
    assert not ckpt.stage_complete(ck, "extract_link", "other-fingerprint")


def test_checkpoint_invalidated_by_config_change(ray_session, tmp_path):
    """ADVICE r1: re-running into the same ckpt_dir with a changed
    stage-affecting flag must NOT serve the stale stage — the
    fingerprint folds in the config, so emit_ts=False yields the
    ts-free triple set, not the cached ts-bearing one."""
    from orionbelt_ontology_builder_ray.pipelines.kg_build import build_kg

    ck = str(tmp_path / "ckpt")
    a = build_kg(SF, ckpt_dir=ck, final_sort=False).to_pandas()
    b = build_kg(SF, ckpt_dir=ck, final_sort=False,
                 emit_ts=False).to_pandas()
    assert len(b) < len(a)
    assert not any(b["predicate"].str.endswith("atTime"))
    assert any(a["predicate"].str.endswith("atTime"))


def test_ntriples_dataset_sink(ray_session, tmp_path):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.sources.ntriples import nt_lines_batch
    from orionbelt_ontology_builder_ray.state.graph import TripleStore

    s = TripleStore("http://t.org/x#")
    s.add_class("A", label="A")
    ds = rd.from_arrow(s.to_arrow())
    lines = ds.map_batches(nt_lines_batch, batch_format="pyarrow").to_pandas()
    assert len(lines) == len(s.rows)
    assert all(l.endswith(" .") for l in lines["line"])


def test_scoped_dedup_equals_broadcast(ray_session):
    """The scoped strategy must produce exactly the broadcast result."""
    from orionbelt_ontology_builder_ray.pipelines.kg_build import build_kg

    a = build_kg(SF, final_sort=False,
                 dedup_strategy="broadcast").to_pandas()
    b = build_kg(SF, final_sort=False, dedup_strategy="scoped").to_pandas()
    assert sorted(map(tuple, a.to_numpy())) == sorted(map(tuple, b.to_numpy()))


def test_dedup_strategy_auto_select():
    from orionbelt_ontology_builder_ray.pipelines.kg_build import (
        DEDUP_BROADCAST_ROW_LIMIT, select_dedup_strategy,
    )

    assert select_dedup_strategy(1_000) == "broadcast"
    assert select_dedup_strategy(DEDUP_BROADCAST_ROW_LIMIT) == "broadcast"
    assert select_dedup_strategy(DEDUP_BROADCAST_ROW_LIMIT + 1) == "scoped"
    assert select_dedup_strategy(10**12, fused=False) == "shuffle"


def test_dedup_strategy_switch_same_output(ray_session):
    """Identical triples across the auto-selection boundary: force the
    limit to 0 so auto resolves to scoped, compare with broadcast."""
    from unittest import mock

    from orionbelt_ontology_builder_ray.pipelines import kg_build

    a = kg_build.build_kg(SF, final_sort=False,
                          dedup_strategy="broadcast").to_pandas()
    with mock.patch.object(kg_build, "DEDUP_BROADCAST_ROW_LIMIT", 0):
        b = kg_build.build_kg(SF, final_sort=False,
                              dedup_strategy="auto").to_pandas()
    assert sorted(map(tuple, a.to_numpy())) == sorted(map(tuple, b.to_numpy()))


def test_ntriples_read_write_roundtrip(ray_session, tmp_path):
    """Distributed sink → distributed source round trip through
    write_ntriples_dataset itself (a CSV-based sink would quote-wrap
    every literal containing '\"' and emit a header — invalid NT)."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.sources.ntriples import (
        read_ntriples_dataset, write_ntriples_dataset,
    )
    from orionbelt_ontology_builder_ray.state.graph import TripleStore

    s = TripleStore("http://t.org/rt#")
    s.add_class("A", label="A label")
    s.add_annotation("A", "label", "etikett", lang="de")
    s.add_annotation("A", "comment", 'she said "hi",\n\tthen left')
    s.add_individual("x", "A")
    path = str(tmp_path / "nt_out")
    ds = rd.from_arrow(s.to_arrow()).repartition(3)
    write_ntriples_dataset(ds, path)
    back = read_ntriples_dataset(path).to_pandas()
    assert set(map(tuple, back.to_numpy())) == \
        {tuple(t) for t in s.to_rows()}


def test_canonicalize_salted_hot_key(ray_session):
    """A hot surface form (many entities, same normalized label) merges
    to one canonical entity through the two-phase salted groupby."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.canonicalize import canonicalize

    n = 50  # entities sharing one hot label, spread across salts
    df = pd.DataFrame({
        "subject": [f"e/{i:03d}" for i in range(n)],
        "predicate": [SKOS_PREF_LABEL] * n,
        "object": ["User"] * n,
        "object_kind": ["literal"] * n,
        "lang": [""] * n, "datatype": [""] * n,
    })
    out, mapping = canonicalize(rd.from_pandas(df))
    assert len(mapping) == n - 1  # everything merged onto e/000
    assert set(mapping.values()) == {"e/000"}
    rows = out.to_pandas()
    assert set(rows["subject"]) == {"e/000"}


def test_resume_after_midpipeline_failure(ray_session, tmp_path):
    """Simulated mid-pipeline crash: extract_link checkpoint exists,
    dedup doesn't — a re-run must reuse the snapshot (not re-extract)
    and complete identically."""
    import shutil

    from orionbelt_ontology_builder_ray.pipelines import checkpoint as ckpt
    from orionbelt_ontology_builder_ray.pipelines.kg_build import build_kg

    ck = str(tmp_path / "ck")
    full = build_kg(SF, ckpt_dir=ck, final_sort=False).to_pandas()
    assert ckpt.read_manifest(ck, "dedup")["complete"]
    # crash simulation: wipe everything after stage 1
    shutil.rmtree(f"{ck}/dedup")
    assert ckpt.read_manifest(ck, "dedup") is None
    assert ckpt.read_manifest(ck, "extract_link")["complete"]
    resumed = build_kg(SF, ckpt_dir=ck, final_sort=False).to_pandas()
    assert sorted(map(tuple, full.to_numpy())) == \
        sorted(map(tuple, resumed.to_numpy()))
    assert ckpt.read_manifest(ck, "dedup")["complete"]


def test_gazetteer_scanner_unmarked_text(ray_session):
    """Dictionary-NER mentions need no [...] markup; word bounds hold
    and overlapping aliases prefer the longer match."""
    import pandas as pd

    from orionbelt_ontology_builder_ray.functions.kg import KG, KG_PLACE
    from orionbelt_ontology_builder_ray.stages.link import (
        GazetteerMentionScanner,
    )

    alias = {
        "france": (KG + "place-france", KG_PLACE, "FRANCE"),
        "new france": (KG + "place-new_france", KG_PLACE, "NEW FRANCE"),
    }
    scanner = GazetteerMentionScanner(alias)
    batch = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": [0, 1, 0],
        "text": ["we shipped to France today",        # unmarked
                 "New France was mentioned",          # longer alias wins
                 "francesca is not a country"],       # word bound holds
    })
    out = scanner(batch)
    got = set(zip(out["turn"], out["entity"], out["surface"]))
    assert (KG + "c1-t0", KG + "place-france", "FRANCE") in got
    assert (KG + "c1-t1", KG + "place-new_france", "NEW FRANCE") in got
    assert not any(t.endswith("c2-t0") for t, _, _ in got)


def test_incremental_update_equals_full_build(ray_session, tmp_path):
    """update_kg: build on half the conversations, ingest the other
    half incrementally — existing ∪ added must equal the full build
    (existing payload never reshuffled; anti-join on 128-bit hashes)."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.pipelines.kg_build import (
        build_kg, update_kg,
    )
    from orionbelt_ontology_builder_ray.sources.transcripts import (
        derive_transcripts,
    )

    all_t = derive_transcripts(SF).to_pandas()
    convs = sorted(all_t["conv_id"].unique())
    half = set(convs[: len(convs) // 2])
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    rd.from_pandas(all_t[all_t.conv_id.isin(half)]).write_parquet(a_dir)
    rd.from_pandas(all_t[~all_t.conv_id.isin(half)]).write_parquet(b_dir)

    store_dir = str(tmp_path / "store")
    build_kg(SF, transcripts_path=a_dir, final_sort=False,
             output_path=store_dir)
    added_dir = str(tmp_path / "added")
    added = update_kg(store_dir, sf_dir=SF, transcripts_path=b_dir,
                      output_path=added_dir)
    n_added = added.count()
    assert n_added > 0

    full = build_kg(SF, final_sort=False).to_pandas()
    merged = pd.concat([rd.read_parquet(store_dir).to_pandas()[TRIPLE_COLS],
                        rd.read_parquet(added_dir).to_pandas()[TRIPLE_COLS]])
    assert not merged.duplicated().any()  # additions are genuinely new
    assert (set(map(tuple, merged.to_numpy()))
            == set(map(tuple, full.to_numpy())))


def _fused_sets(batch_pd: pd.DataFrame, **kw):
    """Run pandas and arrow fused kernels on the same batch; return
    both results as row-tuple multiset-equivalent sorted frames."""
    from orionbelt_ontology_builder_ray.stages.link import (
        ExtractLinkFused, ExtractLinkFusedArrow,
    )

    out_pd = ExtractLinkFused(ALIAS, **kw)(batch_pd)
    if not isinstance(out_pd, pd.DataFrame):
        out_pd = out_pd.to_pandas()
    out_pa = ExtractLinkFusedArrow(
        ALIAS, **kw)(pa.Table.from_pandas(batch_pd, preserve_index=False))
    return out_pd, out_pa.to_pandas()


@pytest.mark.parametrize("kw", [
    dict(with_dedup_hash=False, with_local_dedup=False),
    dict(with_dedup_hash=False, with_local_dedup=True),
    dict(with_dedup_hash=True, with_local_dedup=False),
])
def test_arrow_fused_equals_pandas_fused(kw):
    """The pyarrow-native fused kernel emits EXACTLY the pandas fused
    kernel's triples (incl. the _h dedup-hash column when enabled) on a
    batch with tools, linked + NIL mentions, and ts literals."""
    a, b = _fused_sets(tiny_transcripts(), emit_ts=True, **kw)
    assert sorted(a.columns) == sorted(b.columns)
    cols = sorted(a.columns)
    sa = a[cols].sort_values(cols).reset_index(drop=True)
    sb = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(sa, sb, check_dtype=False)


def test_arrow_fused_multi_alias_parity():
    """Two surfaces mapping to ONE entity URI (the alias_dict_from_store
    shape: skos:altLabel): both kernels must pick the SAME surface for
    the entity's prefLabel (first occurrence in batch order) — the
    arrow kernel previously kept the LAST surface seen."""
    from orionbelt_ontology_builder_ray.stages.link import (
        ExtractLinkFused, ExtractLinkFusedArrow,
    )

    uri = "http://example.org/kg#place-usa"
    cls = "http://example.org/kg#Place"
    alias = {"usa": (uri, cls, "USA"),
             "united states": (uri, cls, "United States")}
    batch = pd.DataFrame({
        "conv_id": ["c1", "c1"],
        "turn_idx": [0, 1],
        "role": ["user", "assistant"],
        "text": ["ship to [USA] tomorrow",
                 "confirming [United States] then [USA]"],
        "tool": ["", ""],
        "ts": pd.to_datetime(["2024-01-01 10:00:00", "2024-01-01 10:01:00"]),
    })
    kw = dict(emit_ts=False, with_dedup_hash=False, with_local_dedup=True)
    out_pd = ExtractLinkFused(alias, **kw)(batch)
    if not isinstance(out_pd, pd.DataFrame):
        out_pd = out_pd.to_pandas()
    out_pa = ExtractLinkFusedArrow(alias, **kw)(
        pa.Table.from_pandas(batch, preserve_index=False)).to_pandas()
    cols = sorted(out_pd.columns)
    pd.testing.assert_frame_equal(
        out_pd[cols].sort_values(cols).reset_index(drop=True),
        out_pa[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False)


def test_arrow_fused_edge_batches():
    """Empty batch and mention-free/tool-free batch keep a stable
    6-column string schema (the round-2 empty-block lesson)."""
    from orionbelt_ontology_builder_ray.stages.link import ExtractLinkFusedArrow

    fused = ExtractLinkFusedArrow(ALIAS, with_dedup_hash=False,
                                  with_local_dedup=True)
    empty = tiny_transcripts().iloc[:0]
    out = fused(pa.Table.from_pandas(empty, preserve_index=False))
    assert out.column_names == TRIPLE_COLS
    assert len(out) == 0
    assert all(t == pa.string() for t in out.schema.types)

    plain = tiny_transcripts().assign(text=["a", "b", "c"],
                                      tool=["", "", ""])
    out2 = fused(pa.Table.from_pandas(plain, preserve_index=False))
    assert out2.column_names == TRIPLE_COLS
    a, b = _fused_sets(plain, with_dedup_hash=False, with_local_dedup=True)
    assert set(map(tuple, a.to_numpy())) == set(map(tuple, b.to_numpy()))


def test_build_kg_kernel_ab_same_output(ray_session):
    """build_kg(kernel="arrow") == build_kg(kernel="pandas") exactly."""
    from orionbelt_ontology_builder_ray.pipelines.kg_build import build_kg

    a = build_kg(SF, final_sort=False, kernel="arrow").to_pandas()
    b = build_kg(SF, final_sort=False, kernel="pandas").to_pandas()
    assert set(map(tuple, a[TRIPLE_COLS].to_numpy())) \
        == set(map(tuple, b[TRIPLE_COLS].to_numpy()))


def test_build_kg_dict_columns_same_content(ray_session):
    """dict_columns=True (in-flight dictionary representation) holds
    exactly the default build's triples; invalid combinations raise."""
    import pytest

    from orionbelt_ontology_builder_ray.pipelines.kg_build import build_kg

    base = build_kg(SF, final_sort=False).to_pandas()
    d = build_kg(SF, final_sort=False, dedup_strategy="scoped",
                 dict_columns=True).to_pandas()
    key = lambda df: set(map(tuple, df[TRIPLE_COLS].astype(str).to_numpy()))
    assert key(base) == key(d)
    with pytest.raises(ValueError):
        build_kg(SF, final_sort=True, dedup_strategy="scoped",
                 dict_columns=True)
    with pytest.raises(ValueError):
        build_kg(SF, final_sort=False, dedup_strategy="broadcast",
                 dict_columns=True)


def test_build_kg_partitioned_layout_same_content(ray_session, tmp_path):
    """The hash(subject)-partitioned hive layout holds exactly the
    sorted path's triples: every subject's rows land in one 'part'
    bucket, and the arrow-native add_part stage changes bytes moved,
    not content."""
    import pyarrow.dataset as pads

    from orionbelt_ontology_builder_ray.pipelines.kg_build import build_kg

    out = str(tmp_path / "hive")
    build_kg(SF, final_sort=False, partition_buckets=4, output_path=out)
    hive = pads.dataset(out, partitioning="hive").to_table().to_pandas()
    flat = build_kg(SF, final_sort=False).to_pandas()
    assert set(map(tuple, hive[TRIPLE_COLS].to_numpy())) \
        == set(map(tuple, flat[TRIPLE_COLS].to_numpy()))
    per_subject = hive.groupby("subject")["part"].nunique()
    assert (per_subject == 1).all()


def test_pair_index_membership_with_dup_h1():
    """The sorted pair index stays collision-safe when the leading
    64-bit hash collides: duplicated-h1 groups resolve via the exact
    side table, with correct positions.  (The contract is h1-sorted
    arrays + exact pair membership; the within-run h2 order is
    unspecified — the single-key stable argsort keeps input order.)"""
    import numpy as np

    from orionbelt_ontology_builder_ray.pipelines.kg_build import (
        _pair_index, _pair_member, _pair_positions, _subset_index,
    )

    h1 = np.array([5, 5, 5, 2, 9], dtype=np.int64)
    h2 = np.array([10, 30, 20, 1, 7], dtype=np.int64)
    idx = _pair_index(h1, h2)
    assert list(idx["s1"]) == [2, 5, 5, 5, 9]
    assert sorted(zip(idx["s1"], idx["s2"])) \
        == sorted(zip(h1.tolist(), h2.tolist()))
    qa = np.array([5, 5, 5, 5, 2, 9, 9, 4], dtype=np.int64)
    qb = np.array([10, 20, 30, 99, 1, 7, 8, 4], dtype=np.int64)
    m, pos = _pair_positions(idx, qa, qb)
    assert list(m) == [True, True, True, False, True, True, False, False]
    # each hit position must point at exactly the queried pair
    for a, b, p, ok in zip(qa.tolist(), qb.tolist(), pos.tolist(), m):
        if ok:
            assert (int(idx["s1"][p]), int(idx["s2"][p])) == (a, b)
    assert list(_pair_member(idx, qa, qb)) == list(m)
    # subset keeps sorted order and rebuilds the dup table: drop the
    # pair (5, 20) by value, wherever the sort placed it
    drop = (idx["s1"] == 5) & (idx["s2"] == 20)
    assert drop.sum() == 1
    keep = _subset_index(idx, ~drop)
    m2 = _pair_member(keep, qa, qb)
    assert list(m2) == [True, False, True, False, True, True, False, False]


from hypothesis import given, settings
from hypothesis import strategies as st

_small_ints = st.integers(min_value=-8, max_value=8)  # force h1 collisions


@settings(max_examples=80, deadline=None)
@given(st.lists(st.tuples(_small_ints, _small_ints), max_size=40),
       st.lists(st.tuples(_small_ints, _small_ints), min_size=1,
                max_size=40))
def test_pair_index_membership_property(index_pairs, query_pairs):
    """_pair_index/_pair_member match a Python-set reference for ANY
    pair multiset — including heavy duplicated-h1 groups (the tiny int
    domain makes collisions the common case, exercising the side table
    far harder than real 64-bit hashes ever would)."""
    import numpy as np

    from orionbelt_ontology_builder_ray.pipelines.kg_build import (
        _pair_index, _pair_member, _subset_index,
    )

    a = np.array([p[0] for p in index_pairs], dtype=np.int64)
    b = np.array([p[1] for p in index_pairs], dtype=np.int64)
    qa = np.array([p[0] for p in query_pairs], dtype=np.int64)
    qb = np.array([p[1] for p in query_pairs], dtype=np.int64)
    idx = _pair_index(a, b)
    ref = set(zip(a.tolist(), b.tolist()))
    got = _pair_member(idx, qa, qb)
    assert [bool(g) for g in got] == [p in ref for p in query_pairs]
    # subsetting by an arbitrary mask keeps membership exact
    if len(idx["s1"]):
        mask = np.arange(len(idx["s1"])) % 2 == 0
        sub = _subset_index(idx, mask)
        sub_ref = set(zip(idx["s1"][mask].tolist(),
                          idx["s2"][mask].tolist()))
        got2 = _pair_member(sub, qa, qb)
        assert [bool(g) for g in got2] == [p in sub_ref for p in query_pairs]


def test_update_kg_hash_carrying_store(ray_session, tmp_path):
    """A store written with store_hashes=True carries _h1/_h2 columns;
    update_kg probes it by reading just those (no payload re-hash) and
    produces the SAME additions as against a plain store."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.pipelines.kg_build import build_kg, update_kg
    from orionbelt_ontology_builder_ray.sources.transcripts import (
        derive_transcripts,
    )

    tdir = str(tmp_path / "transcripts")
    derive_transcripts(SF).write_parquet(tdir)
    import glob

    files = sorted(glob.glob(tdir + "/*.parquet"))
    a_files, b_files = files[: len(files) // 2] or files[:1], files

    plain = str(tmp_path / "plain")
    hashed = str(tmp_path / "hashed")
    build_kg(SF, transcripts_path=a_files, final_sort=False,
             output_path=plain)
    build_kg(SF, transcripts_path=a_files, final_sort=False,
             output_path=hashed, store_hashes=True)
    sch = rd.read_parquet(hashed).schema().names
    assert "_h1" in sch and "_h2" in sch

    add_plain = update_kg(plain, sf_dir=SF, transcripts_path=b_files) \
        .to_pandas()
    add_hashed = update_kg(hashed, sf_dir=SF, transcripts_path=b_files) \
        .to_pandas()
    assert set(map(tuple, add_plain[TRIPLE_COLS].to_numpy())) \
        == set(map(tuple, add_hashed[TRIPLE_COLS].to_numpy()))
    # zero-addition against the hashed store
    assert update_kg(hashed, sf_dir=SF,
                     transcripts_path=a_files).count() == 0


def test_canonical_rewriter_arrow_equals_pandas(ray_session):
    """The arrow-native rewriter (index_in + take/coalesce) must be
    byte-identical to the pandas .map reference on random triple
    tables, including uri-vs-literal object gating and unmapped
    passthrough (VERDICT r3 item 3)."""
    import random

    import pyarrow as pa

    from orionbelt_ontology_builder_ray.stages.canonicalize import (
        CanonicalRewriter, CanonicalRewriterPandas)

    rng = random.Random(13)
    ents = [f"http://kg/e{i}" for i in range(30)]
    mapping = {e: f"http://kg/canon{i % 5}"
               for i, e in enumerate(ents) if i % 3 == 0}
    rows = []
    for _ in range(500):
        kind = rng.choice(["uri", "literal"])
        rows.append((rng.choice(ents), "http://kg/p",
                     rng.choice(ents) if kind == "uri"
                     else "some literal text", kind, "", ""))
    df = pd.DataFrame(rows, columns=["subject", "predicate", "object",
                                     "object_kind", "lang", "datatype"])
    got = CanonicalRewriter(mapping)(
        pa.Table.from_pandas(df, preserve_index=False)).to_pandas()
    exp = CanonicalRewriterPandas(mapping)(df.copy())
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True))


def test_canonicalize_distributed_closure_equals_driver(ray_session):
    """Forcing driver_pair_cap=0 routes the closure through the
    distributed min-label propagation; the resulting canonical map and
    rewritten triples must be identical to the driver union-find path
    (VERDICT r3 item 5: the documented overflow strategy must be
    exercised, not just described)."""
    import random

    import ray.data as rd

    from orionbelt_ontology_builder_ray.functions.terms import OWL_SAME_AS
    from orionbelt_ontology_builder_ray.stages.canonicalize import canonicalize

    rng = random.Random(5)
    rows = []
    # label-variant families (chains via shared normalized labels)
    for fam in range(12):
        for v, label in enumerate([f"Fam {fam}", f"fam-{fam}", f"FAM {fam}."]):
            rows.append((f"http://kg/f{fam}v{v}", SKOS_PREF_LABEL,
                         label, "literal", "", ""))
    # explicit sameAs chains, some bridging two label families
    for i in range(8):
        rows.append((f"http://kg/f{i}v0", OWL_SAME_AS,
                     f"http://kg/f{i + 1}v1", "uri", "", ""))
    # mention rows whose objects must be rewritten
    for i in range(40):
        rows.append((f"http://kg/t{i}", KG_MENTIONS,
                     f"http://kg/f{rng.randrange(12)}v{rng.randrange(3)}",
                     "uri", "", ""))
    df = pd.DataFrame(rows, columns=["subject", "predicate", "object",
                                     "object_kind", "lang", "datatype"])
    ds = rd.from_pandas(df.sample(frac=1, random_state=2)).repartition(4)

    out_drv, map_drv = canonicalize(ds, driver_pair_cap=10**9)
    out_dst, map_dst = canonicalize(ds, driver_pair_cap=0)
    assert map_dst == map_drv and len(map_drv) > 0
    key = ["subject", "predicate", "object", "object_kind"]
    a = out_drv.to_pandas().sort_values(key).reset_index(drop=True)
    b = out_dst.to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_checkpoint_resume_after_mid_dedup_crash(ray_session, tmp_path):
    """Fault drill (VERDICT r4 item 8): a run that dies MID-DEDUP
    leaves extract_link complete and the dedup stage as an orphaned
    data.tmp with no manifest.  The resumed run must (a) reuse the
    extract_link snapshot untouched (manifest written_at unchanged —
    no recompute), (b) redo dedup from the snapshot, (c) produce the
    identical triple set as an uninterrupted run."""
    import json
    import os
    import shutil

    from orionbelt_ontology_builder_ray.pipelines import checkpoint as ckpt
    from orionbelt_ontology_builder_ray.pipelines.kg_build import build_kg

    ck = str(tmp_path / "ckpt")
    full = build_kg(SF, ckpt_dir=ck, final_sort=False).to_pandas()

    # fabricate the post-crash state: dedup died mid-write (its
    # atomic-rename never happened), extract_link intact
    dedup_dir = os.path.join(ck, "dedup")
    data = os.path.join(dedup_dir, "data")
    os.rename(data, data + ".tmp")           # orphaned partial write
    os.remove(os.path.join(dedup_dir, "manifest.json"))
    el_written_at = ckpt.read_manifest(ck, "extract_link")["written_at"]

    resumed = build_kg(SF, ckpt_dir=ck, final_sort=False).to_pandas()
    assert sorted(map(tuple, full.to_numpy())) \
        == sorted(map(tuple, resumed.to_numpy()))
    # extract_link reused, dedup rebuilt with a fresh manifest
    assert ckpt.read_manifest(ck, "extract_link")["written_at"] \
        == el_written_at
    m = ckpt.read_manifest(ck, "dedup")
    assert m["complete"] and m["rows"] == len(full)

    # a crash that corrupts the manifest itself (half-written JSON)
    # must also be treated as incomplete, not crash the resume
    with open(os.path.join(dedup_dir, "manifest.json"), "w") as f:
        f.write('{"stage": "dedup", "complete": tr')
    resumed2 = build_kg(SF, ckpt_dir=ck, final_sort=False).to_pandas()
    assert len(resumed2) == len(full)
    assert ckpt.read_manifest(ck, "dedup")["complete"]
