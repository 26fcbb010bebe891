"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
ray.init()/shutdown() here or in the library (bench.py and the test
fixture own their own sessions).

- ``entry()`` — flagship KG-construction pipeline on sf0.001.
- ``queries()`` — one callable per implemented operator/pipeline
  (SURVEY.md §2 + training-data ops).
- ``oracle_sql()`` — DuckDB-equivalent SQL per query where the op is
  SQL-expressible; omitted keys get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: transcripts -> extract -> link -> dedup ->
    sort; returns the triples Dataset."""
    from orionbelt_ontology_builder_ray.pipelines.kg_build import build_kg

    return build_kg("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from orionbelt_ontology_builder_ray.pipelines import queries as q

    out = {
        # KG-construction pipeline (SURVEY.md §2.2, §2.5-2.9)
        "kg_transcripts": q.kg_transcripts,
        "kg_triples": q.kg_triples,
        "kg_statistics": q.kg_statistics,
        "kg_conversation_lengths": q.kg_conversation_lengths,
        "kg_tool_usage": q.kg_tool_usage,
        "kg_mentions_by_entity": q.kg_mentions_by_entity,
        "kg_gazetteer_mentions": q.kg_gazetteer_mentions,
        "kg_ner_mentions": q.kg_ner_mentions,
        "kg_search": q.kg_search,
        "kg_duplicate_labels": q.kg_duplicate_labels,
        # r5: usages + delete-impact consolidated (one tagged union)
        # to free a slot for kg_bgp under the 50-slot harness cap
        "kg_usage_impacts": q.kg_usage_impacts,
        # r5: SPARQL-style basic-graph-pattern queries (stages/bgp.py)
        "kg_bgp": q.kg_bgp,
        "kg_turn_text_by_role": q.kg_turn_text_by_role,
        "kg_triples_canonicalized": q.kg_triples_canonicalized,
        "kg_classes": q.kg_classes,
        "kg_individuals_by_class": q.kg_individuals_by_class,
        "kg_inferred_types": q.kg_inferred_types,
        "kg_ntriples": q.kg_ntriples,
        "kg_rename_refs": q.kg_rename_refs,
        "kg_diff_ts_stats": q.kg_diff_ts_stats,
        "kg_detect_conflicts": q.kg_detect_conflicts,
        # r5: events_sessionize rides the 'events' leg of this union;
        # the 'conv' leg is the same operator on the transcripts plane
        "sessionizes": q.sessionizes,
        # r5: the day-2 composition — build(half store) -> update_kg
        # anti-join -> canonicalize -> stats listing, one slot
        "kg_continuous_ingest": q.kg_continuous_ingest,
        "kg_viz_nodes": q.kg_viz_nodes,
        "kg_annotations_all": q.kg_annotations_all,
        "kg_canonicalization_demo": q.kg_canonicalization_demo,
        # training-data ops
        "doc_dedups": q.doc_dedups,
        "doc_token_stats": q.doc_token_stats,
        "doc_repetition": q.doc_repetition,
        # r5: the distributed quality classifier (unrolled-GD oracle,
        # kmeans ROUND contract) rides doc_token_stats'
        # quality_prob_e6 leg — the 50-slot harness cap holds
        "doc_text_profile": q.doc_text_profile,
        "doc_pii_redact": q.doc_pii_redact,
        "doc_samples": q.doc_samples,
        "doc_corpus_mix": q.doc_corpus_mix,
        "doc_ngram_contamination": q.doc_ngram_contamination,
        "doc_simhash_all": q.doc_simhash_all,
        "doc_jaccard_pairs": q.doc_jaccard_pairs,
        "doc_minhash_clusters": q.doc_minhash_clusters,
        "doc_corpus_cleans": q.doc_corpus_cleans,
        "doc_pack": q.doc_pack,
        "embedding_near_dups": q.embedding_near_dups,
        "embedding_clusters": q.embedding_clusters,
        "events_hourly": q.events_hourly,
        "ann_search": q.ann_search,
        "multimodal_pipeline": q.multimodal_pipeline,
        "events_asof_join": q.events_asof_join,
        "events_range_join": q.events_range_join,
        "events_sliding_counts": q.events_sliding_counts,
        # r5: events_topk_per_user + kg_top_mentions_per_conversation
        # consolidated (identical legs, tagged)
        "grouped_topks": q.grouped_topks,
        "events_lag_lead": q.events_lag_lead,
    }
    # schema-plane golden fixtures (hand-written expected outputs),
    # consolidated into ONE slot: the driver caps at 50 oracle slots
    from orionbelt_ontology_builder_ray.pipelines.goldens import q_all_goldens

    out["onto_goldens"] = q_all_goldens
    return out


def oracle_sql() -> dict[str, str]:
    from orionbelt_ontology_builder_ray.pipelines import oracles as o

    sqls = {
        "kg_transcripts": o.sql_kg_transcripts(),
        "kg_triples": o.sql_kg_triples(),
        "kg_statistics": o.sql_kg_statistics(),
        "kg_conversation_lengths": o.sql_kg_conversation_lengths(),
        "kg_tool_usage": o.sql_kg_tool_usage(),
        "kg_mentions_by_entity": o.sql_kg_mentions_by_entity(),
        "kg_gazetteer_mentions": o.sql_kg_gazetteer_mentions(),
        "kg_ner_mentions": o.sql_kg_ner_mentions(),
        "kg_search": o.sql_kg_search(),
        "kg_duplicate_labels": o.sql_kg_duplicate_labels(),
        "kg_usage_impacts": o.sql_kg_usage_impacts(),
        "kg_bgp": o.sql_kg_bgp(),
        "kg_turn_text_by_role": o.sql_kg_turn_text_by_role(),
        "doc_dedups": o.sql_doc_dedups(),
        "doc_token_stats": o.sql_doc_token_stats(),
        "doc_repetition": o.sql_doc_repetition(),
        "doc_corpus_cleans": o.sql_doc_corpus_cleans(),
        "doc_pack": o.sql_doc_pack(),
        "events_hourly": o.sql_events_hourly(),
        "ann_search": o.sql_ann_search(),
        "doc_text_profile": o.sql_doc_text_profile(),
        "doc_pii_redact": o.sql_doc_pii_redact(),
        "doc_samples": o.sql_doc_samples(),
        "doc_corpus_mix": o.sql_doc_corpus_mix(),
        "doc_simhash_all": o.sql_doc_simhash_all(),
        "doc_jaccard_pairs": o.sql_doc_jaccard_pairs(),
        "doc_ngram_contamination": o.sql_doc_ngram_contamination(),
        "multimodal_pipeline": o.sql_multimodal_pipeline(),
        "events_asof_join": o.sql_events_asof_join(),
        "events_range_join": o.sql_events_range_join(),
        "events_sliding_counts": o.sql_events_sliding_counts(),
        "grouped_topks": o.sql_grouped_topks(),
        "kg_continuous_ingest": o.sql_kg_continuous_ingest(),
        "events_lag_lead": o.sql_events_lag_lead(),
        "kg_classes": o.sql_kg_classes(),
        "kg_individuals_by_class": o.sql_kg_individuals_by_class(),
        "kg_inferred_types": o.sql_kg_inferred_types(),
        "kg_ntriples": o.sql_kg_ntriples(),
        "kg_rename_refs": o.sql_kg_rename_refs(),
        "kg_diff_ts_stats": o.sql_kg_diff_ts_stats(),
        "kg_detect_conflicts": o.sql_kg_detect_conflicts(),
        "sessionizes": o.sql_sessionizes(),
        "kg_viz_nodes": o.sql_kg_viz_nodes(),
        "kg_annotations_all": o.sql_kg_annotations_all(),
        "kg_triples_canonicalized": o.sql_kg_triples_canonicalized(),
        "kg_canonicalization_demo": o.sql_kg_canonicalization_demo(),
        "doc_minhash_clusters": o.sql_doc_minhash_clusters(),
        "embedding_near_dups": o.sql_embedding_near_dups(),
        "embedding_clusters": o.sql_embedding_clusters(),
    }
    from orionbelt_ontology_builder_ray.pipelines.goldens import sql_all_goldens

    sqls["onto_goldens"] = sql_all_goldens()
    return sqls
