"""DuckDB oracle SQL for the driver's correctness harness.

Every SQL string here mirrors a Ray pipeline in ``pipelines.queries``
exactly — same rows, same column names — so the driver's
row-count/schema/value-hash comparison passes when the Ray pipeline is
correct.  The triple-emission rules appear twice by design (vectorized
Python in stages/, SQL here); tests assert the two stay in lockstep.
"""

from __future__ import annotations

from ..functions.kg import (
    KG, KG_AT_TIME, KG_CONVERSATION, KG_IN_CONVERSATION, KG_MENTIONS,
    KG_PLACE, KG_REGION, KG_ROLE, KG_TEXT, KG_TOOL, KG_TURN, KG_TURN_INDEX,
    KG_USED_TOOL, LABEL, NAMED_INDIVIDUAL, PREF_LABEL, seed_schema_store,
)
from ..functions.terms import (RDF_TYPE, RDFS_SUBCLASSOF, XSD_DATETIME,
                               XSD_INTEGER)
from ..sources.transcripts import TRANSCRIPTS_SQL


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


# ASCII non-whitespace runs — the SAME RE2 pattern the Ray side
# tokenizes with (stages/textops._WS).  regexp_extract_all, NOT
# trim()+regexp_split_to_array: DuckDB trim() strips only spaces, so
# leading/trailing tabs/newlines would produce empty tokens the Ray
# side filters out (ADVICE r4, medium).
_TOK_SQL = "regexp_extract_all(text, '[^ \\t\\n\\r\\f\\v]+')"


def seed_schema_values_sql() -> str:
    """The seed ontology as a VALUES list (generated from the same
    store the pipeline unions in — single source of truth)."""
    rows = seed_schema_store().to_rows()
    values = ",\n    ".join(
        f"({_sql_str(t.subject)}, {_sql_str(t.predicate)}, "
        f"{_sql_str(t.object)}, {_sql_str(t.object_kind)}, "
        f"{_sql_str(t.lang)}, {_sql_str(t.datatype)})"
        for t in rows)
    return (f"SELECT * FROM (VALUES\n    {values}\n) "
            "AS seed(subject, predicate, object, object_kind, lang, datatype)")


def transcripts_cte() -> str:
    return f"transcripts AS ({TRANSCRIPTS_SQL})"


_TURNS_CTE = f"""turns AS (
  SELECT *,
         '{KG}' || conv_id AS conv_uri,
         '{KG}' || conv_id || '-t' || CAST(turn_idx AS VARCHAR) AS turn_uri
  FROM transcripts
)"""


def _emission_union(emit_ts: bool, include_seed: bool) -> str:
    u = "'uri'", "''", "''"

    def row(s, p, o, kind="'uri'", lang="''", dt="''", src="turns", where=""):
        w = f" WHERE {where}" if where else ""
        return (f"  SELECT {s} AS subject, {p} AS predicate, {o} AS object, "
                f"{kind} AS object_kind, {lang} AS lang, {dt} AS datatype "
                f"FROM {src}{w}")

    lit = "'literal'"
    parts = [
        row("turn_uri", _sql_str(RDF_TYPE), _sql_str(NAMED_INDIVIDUAL)),
        row("turn_uri", _sql_str(RDF_TYPE), _sql_str(KG_TURN)),
        row("turn_uri", _sql_str(KG_IN_CONVERSATION), "conv_uri"),
        row("turn_uri", _sql_str(KG_ROLE), "role", lit),
        row("turn_uri", _sql_str(KG_TEXT), "text", lit),
        row("turn_uri", _sql_str(KG_TURN_INDEX), "CAST(turn_idx AS VARCHAR)",
            lit, "''", _sql_str(XSD_INTEGER)),
        row("conv_uri", _sql_str(RDF_TYPE), _sql_str(NAMED_INDIVIDUAL)),
        row("conv_uri", _sql_str(RDF_TYPE), _sql_str(KG_CONVERSATION)),
    ]
    if emit_ts:
        parts.append(row("turn_uri", _sql_str(KG_AT_TIME),
                         "strftime(ts, '%Y-%m-%dT%H:%M:%S.%f')",
                         lit, "''", _sql_str(XSD_DATETIME)))
    tool_uri = f"'{KG}' || tool"
    parts += [
        row("turn_uri", _sql_str(KG_USED_TOOL), tool_uri, where="tool <> ''"),
        row(tool_uri, _sql_str(RDF_TYPE), _sql_str(NAMED_INDIVIDUAL),
            where="tool <> ''"),
        row(tool_uri, _sql_str(RDF_TYPE), _sql_str(KG_TOOL), where="tool <> ''"),
        row(tool_uri, _sql_str(LABEL), "tool", lit, where="tool <> ''"),
    ]
    place_uri = f"'{KG}place-' || lower(n.n_name)"
    nation_src = ("turns t JOIN nation n "
                  "ON position('[' || n.n_name || ']' IN t.text) > 0")
    parts += [
        row("t.turn_uri", _sql_str(KG_MENTIONS), place_uri, src=nation_src),
        row(place_uri, _sql_str(RDF_TYPE), _sql_str(NAMED_INDIVIDUAL),
            src=nation_src),
        row(place_uri, _sql_str(RDF_TYPE), _sql_str(KG_PLACE), src=nation_src),
        row(place_uri, _sql_str(PREF_LABEL), "n.n_name", lit, src=nation_src),
    ]
    region_uri = f"'{KG}region-' || replace(lower(r.r_name), ' ', '_')"
    region_src = ("turns t JOIN region r "
                  "ON position('[' || r.r_name || ']' IN t.text) > 0")
    parts += [
        row("t.turn_uri", _sql_str(KG_MENTIONS), region_uri, src=region_src),
        row(region_uri, _sql_str(RDF_TYPE), _sql_str(NAMED_INDIVIDUAL),
            src=region_src),
        row(region_uri, _sql_str(RDF_TYPE), _sql_str(KG_REGION), src=region_src),
        row(region_uri, _sql_str(PREF_LABEL), "r.r_name", lit, src=region_src),
    ]
    if include_seed:
        parts.append("  " + seed_schema_values_sql().replace("\n", "\n  "))
    return "\n  UNION ALL\n".join(parts)


def kg_triples_cte(emit_ts: bool = True, include_seed: bool = True) -> str:
    """WITH-clause prefix defining ``triples`` (deduplicated)."""
    return (f"WITH {transcripts_cte()},\n{_TURNS_CTE},\n"
            f"raw_triples AS (\n{_emission_union(emit_ts, include_seed)}\n),\n"
            "triples AS (SELECT DISTINCT subject, predicate, object, "
            "object_kind, lang, datatype FROM raw_triples)")


# ---------------------------------------------------------------------------
# per-query oracle SQL
# ---------------------------------------------------------------------------


def sql_kg_transcripts() -> str:
    return (f"WITH {transcripts_cte()} SELECT conv_id, turn_idx, role, text, "
            "tool, ts FROM transcripts ORDER BY conv_id, turn_idx")


def sql_kg_triples() -> str:
    return (kg_triples_cte() + "\nSELECT * FROM triples "
            "ORDER BY subject, predicate, object, object_kind, lang, datatype")


def sql_kg_triples_canonicalized() -> str:
    """Mirror of the flagship with canonicalization active: entities
    sharing a normalized prefLabel merge onto the min URI and every
    subject/object reference is rewritten, then exact dedup + sort.

    The SQL computes the canonical map as min(entity) per normalized
    label group — exactly the union-find result whenever no entity
    carries two differently-normalized prefLabels (true by construction
    here: the linker mints one URI per normalized surface form, so the
    closure has no transitive bridges; kg_canonicalization_demo pins
    the non-identity mapping behavior on injected variants)."""
    pl = _sql_str(PREF_LABEL)
    return (kg_triples_cte() + f""",
labels AS (
  SELECT DISTINCT subject AS entity,
         trim(regexp_replace(lower(object), '[^a-z0-9]+', ' ', 'g')) AS norm
  FROM triples WHERE predicate = {pl}),
canon AS (
  SELECT entity, min(entity) OVER (PARTITION BY norm) AS canonical
  FROM labels),
rewritten AS (
  SELECT coalesce(cs.canonical, t.subject) AS subject, t.predicate,
         CASE WHEN t.object_kind = 'uri'
              THEN coalesce(co.canonical, t.object) ELSE t.object
         END AS object,
         t.object_kind, t.lang, t.datatype
  FROM triples t
  LEFT JOIN canon cs ON cs.entity = t.subject
  LEFT JOIN canon co ON co.entity = t.object AND t.object_kind = 'uri')
SELECT DISTINCT subject, predicate, object, object_kind, lang, datatype
FROM rewritten
ORDER BY subject, predicate, object, object_kind, lang, datatype""")


def sql_kg_canonicalization_demo() -> str:
    """Mirror of kg_canonicalization_demo: each injected
    '<place>-variant' URI (case/punctuation label variant) must map
    back onto its original — the union-find min-URI closure reduces to
    exactly that pair set because variants share their original's
    normalized label and originals are already canonical."""
    pl = _sql_str(PREF_LABEL)
    like = _sql_str(KG + "place-%")
    return (kg_triples_cte() + f"""
SELECT subject || '-variant' AS entity, subject AS canonical
FROM (SELECT DISTINCT subject FROM triples
      WHERE predicate = {pl} AND subject LIKE {like})
ORDER BY entity""")


def sql_kg_statistics(n_iter: int = 4) -> str:
    """Tagged union: type counts over rdf:type rows (get_statistics
    analog, om:2868-2901 / groupby(object).count()) plus
    ``pagerank::<uri>`` rows = e6 fixed-point PageRank over the
    entity graph, unrolled through ``n_iter`` integer iterations
    (stages/pagerank.py data contract: r0 = 1e6 mass units/node,
    contrib = (85*r)//(100*outdeg), dangling redistributed
    (85*D)//(100*N), teleport 150000).  ``ppr::<uri>`` rows mirror
    PERSONALIZED PageRank with the place-prefix seed set: teleport
    (15*N*1e6)//(100*S) and dangling (85*D)//(100*S) flow only to
    seed nodes (stages/pagerank.py seed_prefix contract, same
    uniform r0).  ``cc::<uri>`` rows = component size after 6 rounds
    of undirected min-URI-label propagation and ``hop::<uri>`` rows =
    exact BFS distance (<= 6 hops) from the nearest place seed, both
    unrolled the same way (stages/components.py contract; LEAST
    ignores NULLs in DuckDB, verified).  ``core::<uri>`` rows =
    6-round 3-core peeling survivors with their degree among the
    final survivor set (kcore_fixed_rounds).  ``lpa::<uri>`` rows =
    community size after 4 unrolled rounds of synchronous label
    propagation (majority neighbor label; ties -> lexicographically
    smallest, the ROW_NUMBER ORDER BY c DESC, lab mirror of the
    numpy lexsort — lpa_communities).  ``hub::``/``auth::`` rows =
    HITS after 4 unrolled iterations, max-normalized by exact
    HUGEINT floor division (hits_scores contract).
    ``walk:<seed>|<step>|<node>`` rows = deterministic DeepWalk-style
    walks from the place seeds, next hop = md5-argmin over neighbors
    (ROW_NUMBER ORDER BY md5(...), nbr — walks.seeded_walks; the
    whole path is hash-checked through the tag).  Pure integer
    arithmetic —
    bit-identical to the numpy engine by construction.  CTEs are
    MATERIALIZED: chained iteration CTEs otherwise re-evaluate
    exponentially in DuckDB."""
    parts = [f"""
pr_edges AS MATERIALIZED (
  SELECT DISTINCT subject AS src, object AS dst FROM triples
  WHERE object_kind = 'uri' AND predicate <> {_sql_str(RDF_TYPE)}
    AND subject <> object),
pr_nodes AS MATERIALIZED (
  SELECT uri FROM (SELECT src AS uri FROM pr_edges
                   UNION SELECT dst FROM pr_edges)),
pr_deg AS MATERIALIZED (
  SELECT src, COUNT(*) AS d FROM pr_edges GROUP BY src),
pr_n AS MATERIALIZED (SELECT COUNT(*) AS n FROM pr_nodes),
pr_r0 AS MATERIALIZED (
  SELECT uri, CAST(1000000 AS BIGINT) AS r FROM pr_nodes),
ppr_ns AS MATERIALIZED (
  SELECT COUNT(*) AS ns FROM pr_nodes
  WHERE uri LIKE {_sql_str(KG + "place-")} || '%'),
ppr_tp AS MATERIALIZED (
  SELECT (15 * (SELECT n FROM pr_n) * 1000000)
         // (100 * NULLIF((SELECT ns FROM ppr_ns), 0)) AS tp),
ppr_r0 AS MATERIALIZED (
  SELECT uri, CAST(1000000 AS BIGINT) AS r FROM pr_nodes),
cc_und AS MATERIALIZED (
  SELECT src, dst FROM pr_edges UNION SELECT dst, src FROM pr_edges),
cc_r0 AS MATERIALIZED (
  SELECT uri, uri AS lab FROM pr_nodes),
hop_r0 AS MATERIALIZED (
  SELECT uri, CASE WHEN uri LIKE {_sql_str(KG + "place-")} || '%'
                   THEN CAST(0 AS BIGINT) END AS d
  FROM pr_nodes)"""]
    for i in range(1, n_iter + 1):
        p = i - 1
        parts.append(f"""
pr_dang{i} AS MATERIALIZED (
  SELECT (85 * COALESCE(SUM(p.r), 0)) // (100 * (SELECT n FROM pr_n)) AS ds
  FROM pr_r{p} p LEFT JOIN pr_deg g ON g.src = p.uri
  WHERE g.src IS NULL),
pr_r{i} AS MATERIALIZED (
  SELECT n.uri,
         CAST(150000 + (SELECT ds FROM pr_dang{i}) + COALESCE(c.s, 0)
              AS BIGINT) AS r
  FROM pr_nodes n LEFT JOIN (
    SELECT e.dst AS uri, SUM((85 * p.r) // (100 * g.d)) AS s
    FROM pr_edges e
    JOIN pr_r{p} p ON p.uri = e.src
    JOIN pr_deg g ON g.src = e.src
    GROUP BY e.dst) c ON c.uri = n.uri),
ppr_dang{i} AS MATERIALIZED (
  SELECT (85 * COALESCE(SUM(p.r), 0))
         // (100 * NULLIF((SELECT ns FROM ppr_ns), 0)) AS ds
  FROM ppr_r{p} p LEFT JOIN pr_deg g ON g.src = p.uri
  WHERE g.src IS NULL),
ppr_r{i} AS MATERIALIZED (
  SELECT n.uri,
         CAST(CASE WHEN n.uri LIKE {_sql_str(KG + "place-")} || '%'
              THEN (SELECT tp FROM ppr_tp)
                   + (SELECT ds FROM ppr_dang{i})
              ELSE 0 END + COALESCE(c.s, 0) AS BIGINT) AS r
  FROM pr_nodes n LEFT JOIN (
    SELECT e.dst AS uri, SUM((85 * p.r) // (100 * g.d)) AS s
    FROM pr_edges e
    JOIN ppr_r{p} p ON p.uri = e.src
    JOIN pr_deg g ON g.src = e.src
    GROUP BY e.dst) c ON c.uri = n.uri)""")
    for i in range(1, 7):  # components.DEFAULT_ROUNDS = 6
        p = i - 1
        parts.append(f"""
cc_r{i} AS MATERIALIZED (
  SELECT n.uri, LEAST(p.lab, COALESCE(m.ml, p.lab)) AS lab
  FROM pr_nodes n JOIN cc_r{p} p ON p.uri = n.uri
  LEFT JOIN (SELECT e.dst AS uri, MIN(q.lab) AS ml
             FROM cc_und e JOIN cc_r{p} q ON q.uri = e.src
             GROUP BY e.dst) m ON m.uri = n.uri),
hop_r{i} AS MATERIALIZED (
  SELECT n.uri, LEAST(p.d, m.md) AS d
  FROM pr_nodes n JOIN hop_r{p} p ON p.uri = n.uri
  LEFT JOIN (SELECT e.dst AS uri, MIN(q.d) + 1 AS md
             FROM cc_und e JOIN hop_r{p} q ON q.uri = e.src
             WHERE q.d IS NOT NULL
             GROUP BY e.dst) m ON m.uri = n.uri)""")
    parts.append("""
hits_h0 AS MATERIALIZED (
  SELECT uri, CAST(1000000 AS HUGEINT) AS v FROM pr_nodes)""")
    for i in range(1, 5):  # pagerank.hits_scores n_iter = 4
        p = i - 1
        parts.append(f"""
hits_ar{i} AS MATERIALIZED (
  SELECT n.uri, COALESCE(s.s, 0) AS raw
  FROM pr_nodes n LEFT JOIN (
    SELECT e.dst AS uri, SUM(p.v) AS s FROM pr_edges e
    JOIN hits_h{p} p ON p.uri = e.src GROUP BY e.dst) s
    ON s.uri = n.uri),
hits_a{i} AS MATERIALIZED (
  SELECT uri, CASE WHEN (SELECT MAX(raw) FROM hits_ar{i}) = 0
                   THEN CAST(0 AS HUGEINT)
                   ELSE (raw * 1000000)
                        // (SELECT MAX(raw) FROM hits_ar{i}) END AS v
  FROM hits_ar{i}),
hits_hr{i} AS MATERIALIZED (
  SELECT n.uri, COALESCE(s.s, 0) AS raw
  FROM pr_nodes n LEFT JOIN (
    SELECT e.src AS uri, SUM(p.v) AS s FROM pr_edges e
    JOIN hits_a{i} p ON p.uri = e.dst GROUP BY e.src) s
    ON s.uri = n.uri),
hits_h{i} AS MATERIALIZED (
  SELECT uri, CASE WHEN (SELECT MAX(raw) FROM hits_hr{i}) = 0
                   THEN CAST(0 AS HUGEINT)
                   ELSE (raw * 1000000)
                        // (SELECT MAX(raw) FROM hits_hr{i}) END AS v
  FROM hits_hr{i})""")
    parts.append("""
lpa_r0 AS MATERIALIZED (SELECT uri, uri AS lab FROM pr_nodes)""")
    for i in range(1, 5):  # components.LPA_ROUNDS = 4
        p = i - 1
        parts.append(f"""
lpa_r{i} AS MATERIALIZED (
  SELECT v AS uri, lab FROM (
    SELECT e.dst AS v, q.lab AS lab,
           ROW_NUMBER() OVER (PARTITION BY e.dst
                              ORDER BY COUNT(*) DESC, q.lab) AS rk
    FROM cc_und e JOIN lpa_r{p} q ON q.uri = e.src
    GROUP BY e.dst, q.lab) WHERE rk = 1)""")
    parts.append(f"""
lpa_sizes AS MATERIALIZED (
  SELECT lab, COUNT(*) AS n FROM lpa_r4 GROUP BY lab),
walk_w0 AS MATERIALIZED (
  SELECT uri AS walk_id, uri AS cur FROM pr_nodes
  WHERE uri LIKE {_sql_str(KG + "place-")} || '%')""")
    for i in range(1, 5):  # walks.WALK_STEPS = 4
        p = i - 1
        parts.append(f"""
walk_w{i} AS MATERIALIZED (
  SELECT walk_id, nxt AS cur FROM (
    SELECT w.walk_id, e.src AS nxt,
           ROW_NUMBER() OVER (PARTITION BY w.walk_id
             ORDER BY md5(w.walk_id || '|{i}|' || e.src), e.src) AS rk
    FROM walk_w{p} w JOIN cc_und e ON e.dst = w.cur) WHERE rk = 1)""")
    parts.append("""
core_a0 AS MATERIALIZED (SELECT uri FROM pr_nodes)""")
    for i in range(1, 7):  # fixed-round 3-core peeling, 6 rounds
        p = i - 1
        parts.append(f"""
core_a{i} AS MATERIALIZED (
  SELECT e.src AS uri FROM cc_und e
  JOIN core_a{p} x ON x.uri = e.src
  JOIN core_a{p} y ON y.uri = e.dst
  GROUP BY e.src HAVING COUNT(*) >= 3)""")
    parts.append("""
core_deg AS MATERIALIZED (
  SELECT a.uri, CAST(COALESCE(d.d, 0) AS BIGINT) AS d
  FROM core_a6 a LEFT JOIN (
    SELECT e.src AS uri, COUNT(*) AS d FROM cc_und e
    JOIN core_a6 x ON x.uri = e.src
    JOIN core_a6 y ON y.uri = e.dst
    GROUP BY e.src) d ON d.uri = a.uri),
cc_sizes AS MATERIALIZED (
  SELECT lab, COUNT(*) AS n FROM cc_r6 GROUP BY lab),
pr_ind AS MATERIALIZED (
  SELECT dst, COUNT(*) AS d FROM pr_edges GROUP BY dst),
tri_und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM pr_edges),
tri_deg AS MATERIALIZED (
  SELECT x, COUNT(*) AS d FROM (
    SELECT a AS x FROM tri_und UNION ALL SELECT b FROM tri_und)
  GROUP BY x),
tri_or AS MATERIALIZED (
  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
              THEN a ELSE b END AS s,
         CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
              THEN b ELSE a END AS t
  FROM tri_und
  JOIN tri_deg da ON da.x = a JOIN tri_deg db ON db.x = b),
tri_cnt AS (
  SELECT COUNT(*) AS n
  FROM tri_or e1
  JOIN tri_or e2 ON e2.s = e1.s AND e1.t < e2.t
  JOIN tri_deg d1 ON d1.x = e1.t
  JOIN tri_deg d2 ON d2.x = e2.t
  JOIN tri_or e3
    ON e3.s = CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e1.t < e2.t)
                   THEN e1.t ELSE e2.t END
   AND e3.t = CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e1.t < e2.t)
                   THEN e2.t ELSE e1.t END)""")
    pr_ctes = ",".join(parts)
    return (kg_triples_cte() + "," + pr_ctes
            + f"""
SELECT type_uri, n FROM (
  SELECT object AS type_uri, COUNT(*) AS n FROM triples
  WHERE predicate = {_sql_str(RDF_TYPE)} GROUP BY object
  UNION ALL
  SELECT 'pagerank::' || uri AS type_uri, r AS n FROM pr_r{n_iter}
  UNION ALL
  SELECT 'ppr::' || uri, r FROM ppr_r{n_iter}
  WHERE (SELECT ns FROM ppr_ns) > 0
  UNION ALL
  SELECT 'cc::' || c.uri, s.n FROM cc_r6 c JOIN cc_sizes s ON s.lab = c.lab
  UNION ALL
  SELECT 'lpa::' || r.uri, s.n
  FROM lpa_r4 r JOIN lpa_sizes s ON s.lab = r.lab
  UNION ALL
  SELECT 'hub::' || uri, CAST(v AS BIGINT) FROM hits_h4
  UNION ALL
  SELECT 'auth::' || uri, CAST(v AS BIGINT) FROM hits_a4"""
            + "".join(f"""
  UNION ALL
  SELECT 'walk:' || walk_id || '|{i}|' || cur, CAST({i} AS BIGINT)
  FROM walk_w{i}""" for i in range(5)) + """
  UNION ALL
  SELECT 'hop::' || uri, d FROM hop_r6 WHERE d IS NOT NULL
  UNION ALL
  SELECT 'core::' || uri, d FROM core_deg
  UNION ALL
  SELECT 'outdeg:' || d, COUNT(*) FROM pr_deg GROUP BY d
  UNION ALL
  SELECT 'outdeg:0', (SELECT n FROM pr_n) - (SELECT COUNT(*) FROM pr_deg)
  WHERE (SELECT n FROM pr_n) > (SELECT COUNT(*) FROM pr_deg)
  UNION ALL
  SELECT 'indeg:' || d, COUNT(*) FROM pr_ind GROUP BY d
  UNION ALL
  SELECT 'indeg:0', (SELECT n FROM pr_n) - (SELECT COUNT(*) FROM pr_ind)
  WHERE (SELECT n FROM pr_n) > (SELECT COUNT(*) FROM pr_ind)
  UNION ALL
  SELECT 'triangles', (SELECT n FROM tri_cnt))
ORDER BY type_uri""")


def sql_kg_conversation_lengths() -> str:
    """Tagged-union mirror of queries.kg_conversation_lengths: the
    length stats + the transcript integrity audit
    (stages/windows.log_integrity).  Blank test = NULL or
    whitespace-only (RE2 interprets the \\t.. escapes, the _TOK_SQL
    idiom); role repeats = LAG over the same (turn_idx, ts, role)
    total order the Ray side lexsorts by."""
    return f"""
WITH {transcripts_cte()},
flags AS (
  SELECT conv_id, turn_idx,
         CASE WHEN text IS NULL
                OR regexp_matches(text, '^[ \\t\\n\\r\\f\\v]*$')
              THEN 1 ELSE 0 END AS blank,
         CASE WHEN role = lag(role) OVER (PARTITION BY conv_id
                                          ORDER BY turn_idx, ts, role)
              THEN 1 ELSE 0 END AS rep
  FROM transcripts),
agg AS (
  SELECT conv_id,
         COUNT(*) AS n_turns,
         MAX(turn_idx) AS max_turn_idx,
         COUNT(*) - COUNT(DISTINCT turn_idx) AS n_dup,
         (MAX(turn_idx) - MIN(turn_idx) + 1) - COUNT(DISTINCT turn_idx)
           AS n_gaps,
         SUM(rep) AS n_rep,
         SUM(blank) AS n_blank
  FROM flags GROUP BY conv_id)
SELECT conv_id, 'n_turns' AS metric, CAST(n_turns AS BIGINT) AS n FROM agg
UNION ALL
SELECT conv_id, 'max_turn_idx', CAST(max_turn_idx AS BIGINT) FROM agg
UNION ALL
SELECT conv_id, 'n_dup_turn_idx', CAST(n_dup AS BIGINT) FROM agg
UNION ALL
SELECT conv_id, 'n_gaps', CAST(n_gaps AS BIGINT) FROM agg
UNION ALL
SELECT conv_id, 'n_role_repeats', CAST(n_rep AS BIGINT) FROM agg
UNION ALL
SELECT conv_id, 'n_blank_text', CAST(n_blank AS BIGINT) FROM agg"""


def sql_kg_tool_usage() -> str:
    return (kg_triples_cte()
            + f"\nSELECT object AS tool_uri, COUNT(*) AS n_turns FROM triples "
              f"WHERE predicate = {_sql_str(KG_USED_TOOL)} "
              "GROUP BY object ORDER BY tool_uri")


def sql_kg_mentions_by_entity() -> str:
    """Tagged union: per-entity mention counts plus ``com::<a>|<b>``
    co-mention pair counts (self-join on the mentioning turn, a < b —
    mirror of stages/components.comention_pairs) plus ``pmi::<a>|<b>``
    e6-rounded PMI edge weights (comention_pmi;
    pmi_e6 = ROUND(ln(n_ab*T/(n_a*n_b))*1e6), the tfidf idf_e6 ulp
    contract) plus the r5 link-prediction legs over the co-mention
    graph (mirror of stages/components.linkpred_scores): ``cn::``
    common-neighbor counts, ``jac::`` pure-integer half-up e6
    neighborhood Jaccard ``(2000000*cn + den) // (2*den)`` (no float
    ops — both engines floor-divide positive ints), ``aa::``
    Adamic–Adar with per-center ROUND(1e6/ln(deg)) int64 terms summed
    order-free; plus ``first::``/``last::`` temporal legs = per-entity
    min/max mention time as epoch_us BIGINT (mention_time_spans
    mirror — pandas int64-ns // 1000 == epoch_us, verified)."""
    return (kg_triples_cte() + f""",
m AS (SELECT subject AS turn, object AS ent FROM triples
      WHERE predicate = {_sql_str(KG_MENTIONS)}),
ec AS (SELECT ent, COUNT(*) AS n FROM m GROUP BY ent),
tt AS (SELECT COUNT(DISTINCT turn) AS t FROM m),
cm AS MATERIALIZED (
  SELECT a.ent AS ea, b.ent AS eb, COUNT(*) AS n
  FROM m a JOIN m b ON a.turn = b.turn AND a.ent < b.ent
  GROUP BY a.ent, b.ent),
lp_sym AS MATERIALIZED (
  SELECT ea AS x, eb AS y FROM cm UNION ALL SELECT eb, ea FROM cm),
lp_deg AS MATERIALIZED (
  SELECT x AS v, COUNT(*) AS d FROM lp_sym GROUP BY x),
lp_cn AS MATERIALIZED (
  SELECT s1.y AS px, s2.y AS py, COUNT(*) AS cn,
         SUM(CAST(ROUND(1e6 / ln(d.d)) AS BIGINT)) AS aa
  FROM lp_sym s1 JOIN lp_sym s2 ON s1.x = s2.x AND s1.y < s2.y
  JOIN lp_deg d ON d.v = s1.x
  GROUP BY s1.y, s2.y),
lp AS (
  SELECT px, py, cn, aa,
         (2000000 * cn + (da.d + db.d - cn))
           // (2 * (da.d + db.d - cn)) AS jac
  FROM lp_cn JOIN lp_deg da ON da.v = px JOIN lp_deg db ON db.v = py),
mts AS (SELECT subject AS turn, CAST(object AS TIMESTAMP) AS ts
        FROM triples WHERE predicate = {_sql_str(KG_AT_TIME)}),
msp AS (SELECT m.ent, MIN(t.ts) AS f, MAX(t.ts) AS l
        FROM m JOIN mts t ON t.turn = m.turn GROUP BY m.ent)
SELECT entity_uri, n_mentions FROM (
  SELECT ent AS entity_uri, n AS n_mentions FROM ec
  UNION ALL
  SELECT 'com::' || ea || '|' || eb, n FROM cm
  UNION ALL
  SELECT 'pmi::' || cm.ea || '|' || cm.eb,
         CAST(ROUND(ln(CAST(cm.n * (SELECT t FROM tt) AS DOUBLE)
                       / CAST(ca.n * cb.n AS DOUBLE)) * 1e6) AS BIGINT)
  FROM cm JOIN ec ca ON ca.ent = cm.ea JOIN ec cb ON cb.ent = cm.eb
  UNION ALL
  SELECT 'cn::' || px || '|' || py, cn FROM lp
  UNION ALL
  SELECT 'jac::' || px || '|' || py, CAST(jac AS BIGINT) FROM lp
  UNION ALL
  SELECT 'aa::' || px || '|' || py, CAST(aa AS BIGINT) FROM lp
  UNION ALL
  SELECT 'first::' || ent, epoch_us(f) FROM msp
  UNION ALL
  SELECT 'last::' || ent, epoch_us(l) FROM msp)
ORDER BY entity_uri""")


def sql_kg_search(query: str = "nation_1") -> str:
    """Case-insensitive substring search over entity labels
    (om:2301-2347 analog, label field)."""
    q = _sql_str("%" + query.lower() + "%")
    return (kg_triples_cte()
            + f"\nSELECT DISTINCT subject AS uri, object AS label FROM triples "
              f"WHERE predicate IN ({_sql_str(PREF_LABEL)}, {_sql_str(LABEL)}) "
              f"AND lower(object) LIKE {q} ORDER BY uri, label")


def sql_kg_duplicate_labels() -> str:
    """Duplicate-label detection (om:2834-2849)."""
    return (kg_triples_cte()
            + f"\nSELECT object AS label, COUNT(DISTINCT subject) AS n_subjects "
              f"FROM triples WHERE predicate IN ({_sql_str(LABEL)}, "
              f"{_sql_str(PREF_LABEL)}) "
              "GROUP BY object HAVING COUNT(DISTINCT subject) > 1 "
              "ORDER BY label")


def sql_kg_delete_impact(entity_local: str = "place-nation_1") -> str:
    """Delete-impact counts: 3-way semi-joins (om:371-455)."""
    uri = _sql_str(KG + entity_local)
    return (kg_triples_cte() + f"""
SELECT
  (SELECT COUNT(*) FROM triples WHERE subject = {uri}) AS direct_triples,
  (SELECT COUNT(*) FROM triples WHERE object = {uri}
     AND object_kind = 'uri') AS inbound_refs,
  (SELECT COUNT(*) FROM triples WHERE predicate = {uri}) AS as_predicate""")


def sql_kg_usages(entity_local: str = "region-europe") -> str:
    """Resource usages: inbound rows (om:2351-2396)."""
    uri = _sql_str(KG + entity_local)
    return (kg_triples_cte()
            + f"\nSELECT subject, predicate FROM triples WHERE object = {uri} "
              f"AND object_kind = 'uri' ORDER BY subject, predicate")


def sql_kg_usage_impacts(entity_local: str = "region-europe",
                         impact_local: str = "place-nation_1") -> str:
    """Tagged union of sql_kg_usages rows + sql_kg_delete_impact
    counts (one slot, schema (kind, subject, predicate, n))."""
    uri = _sql_str(KG + entity_local)
    imp = _sql_str(KG + impact_local)
    return (kg_triples_cte() + f"""
SELECT 'usage' AS kind, subject, predicate, CAST(1 AS BIGINT) AS n
FROM triples WHERE object = {uri} AND object_kind = 'uri'
UNION ALL
SELECT 'impact::direct_triples', '', '',
       (SELECT COUNT(*) FROM triples WHERE subject = {imp})
UNION ALL
SELECT 'impact::inbound_refs', '', '',
       (SELECT COUNT(*) FROM triples WHERE object = {imp}
          AND object_kind = 'uri')
UNION ALL
SELECT 'impact::as_predicate', '', '',
       (SELECT COUNT(*) FROM triples WHERE predicate = {imp})""")


def sql_kg_bgp() -> str:
    """Mirror of queries.kg_bgp: each BGP leg is a plain self-join of
    the triples CTE; the binding string concatenates the variables in
    sorted-name order exactly like stages/bgp.bgp_bindings_tagged.
    String inequality (?a < ?b) compares ASCII URIs, where DuckDB's
    byte collation and Python's code-point order agree."""
    rt, pl, pref = _sql_str(RDF_TYPE), _sql_str(KG_PLACE), _sql_str(PREF_LABEL)
    role, used = _sql_str(KG_ROLE), _sql_str(KG_USED_TOOL)
    men, inconv = _sql_str(KG_MENTIONS), _sql_str(KG_IN_CONVERSATION)
    return (kg_triples_cte() + f"""
SELECT 'place_labels' AS q,
       '?e=' || t1.subject || '|?l=' || t2.object AS binding
FROM triples t1 JOIN triples t2 ON t1.subject = t2.subject
WHERE t1.predicate = {rt} AND t1.object = {pl} AND t2.predicate = {pref}
UNION ALL
SELECT 'tool_turns', '?t=' || t1.subject || '|?tool=' || t2.object
FROM triples t1 JOIN triples t2 ON t1.subject = t2.subject
WHERE t1.predicate = {role} AND t1.object = 'tool'
  AND t2.predicate = {used}
UNION ALL
SELECT 'comention', '?a=' || t1.object || '|?b=' || t2.object
FROM triples t1 JOIN triples t2 ON t1.subject = t2.subject
WHERE t1.predicate = {men} AND t2.predicate = {men}
  AND t1.object < t2.object
UNION ALL
SELECT 'mention_chain',
       '?c=' || t3.object || '|?e=' || t1.object || '|?t=' || t1.subject
FROM triples t1
JOIN triples t2 ON t1.object = t2.subject
JOIN triples t3 ON t1.subject = t3.subject
WHERE t1.predicate = {men} AND t2.predicate = {rt} AND t2.object = {pl}
  AND t3.predicate = {inconv}
UNION ALL
SELECT 'turn_tool_opt',
       '?t=' || t1.subject || '|?tool=' || COALESCE(t2.object, 'NULL')
FROM triples t1
LEFT JOIN triples t2 ON t1.subject = t2.subject
  AND t2.predicate = {used}
WHERE t1.predicate = {rt} AND t1.object = {_sql_str(KG + 'Turn')}
UNION ALL
SELECT 'place_mention_counts',
       '?e=' || e || '|?n=' || CAST(n AS VARCHAR)
FROM (
  SELECT t1.object AS e, COUNT(*) AS n
  FROM triples t1
  JOIN triples t2 ON t1.object = t2.subject
  JOIN triples t3 ON t1.subject = t3.subject
  WHERE t1.predicate = {men} AND t2.predicate = {rt}
    AND t2.object = {pl} AND t3.predicate = {inconv}
  GROUP BY t1.object)
UNION ALL
SELECT 'subclass_path', '?a=' || e || '|?c=' || s
FROM (
  WITH RECURSIVE cl AS (
    SELECT subject AS s, object AS e FROM triples
    WHERE predicate = {_sql_str(RDFS_SUBCLASSOF)}
    UNION
    SELECT cl.s, t.object AS e FROM cl
    JOIN triples t ON cl.e = t.subject
    WHERE t.predicate = {_sql_str(RDFS_SUBCLASSOF)}
  ) SELECT s, e FROM cl)
UNION ALL
SELECT 'mentions_after', '?e=' || e || '|?n=' || CAST(n AS VARCHAR)
FROM (
  SELECT t1.object AS e, COUNT(*) AS n
  FROM triples t1 JOIN triples t2 ON t1.subject = t2.subject
  WHERE t1.predicate = {men}
    AND t2.predicate = {_sql_str(KG_AT_TIME)}
    AND t2.object >= '2024-01-15'
  GROUP BY t1.object)
UNION ALL
SELECT 'turns_no_tool', '?t=' || t1.subject
FROM triples t1
WHERE t1.predicate = {rt} AND t1.object = {_sql_str(KG + 'Turn')}
  AND NOT EXISTS (SELECT 1 FROM triples t2
                  WHERE t2.subject = t1.subject
                    AND t2.predicate = {used})
UNION ALL
SELECT 'construct_comention',
       a || ' {KG}coMentionedWith ' || b
       || CASE WHEN b LIKE 'http%' THEN ' uri' ELSE ' literal' END
FROM (
  SELECT DISTINCT t1.object AS a, t2.object AS b
  FROM triples t1 JOIN triples t2 ON t1.subject = t2.subject
  WHERE t1.predicate = {men} AND t2.predicate = {men}
    AND t1.object < t2.object)""")


def sql_kg_turn_text_by_role(role: str = "tool") -> str:
    """Predicate+filter projection: text of all turns with a role."""
    return (kg_triples_cte() + f"""
SELECT t1.subject AS turn_uri, t2.object AS text
FROM triples t1 JOIN triples t2 ON t1.subject = t2.subject
WHERE t1.predicate = {_sql_str(KG_ROLE)} AND t1.object = {_sql_str(role)}
  AND t2.predicate = {_sql_str(KG_TEXT)}
ORDER BY turn_uri""")


# ---------------------------------------------------------------------------
# training-data ops over documents / embeddings / events
# ---------------------------------------------------------------------------


def sql_doc_dedup_exact() -> str:
    return ("SELECT text, MIN(doc_id) AS doc_id FROM documents "
            "GROUP BY text ORDER BY doc_id")


def sql_doc_token_counts() -> str:
    from ..stages.textops import BPE_TOKEN_RE

    return ("SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
            f"CAST(length({_TOK_SQL}) AS BIGINT) AS n_tokens, "
            "CAST(length(regexp_extract_all(text, "
            f"{_sql_str(BPE_TOKEN_RE)})) AS BIGINT) AS n_bpe_tokens "
            "FROM documents ORDER BY doc_id")


def sql_doc_ngram_stats(n: int = 2) -> str:
    """Distinct word-bigram count per doc (n-gram fingerprint basis)."""
    return f"""
WITH toks AS (
  SELECT doc_id, w FROM (SELECT doc_id, {_TOK_SQL} AS w FROM documents)
  WHERE array_length(w) >= 1
)
SELECT doc_id,
       CAST(length(list_distinct(list_transform(
            range(1, array_length(w)), i -> w[i] || ' ' || w[i+1])))
            AS BIGINT) AS n_distinct_bigrams
FROM toks ORDER BY doc_id"""


def sql_events_hourly() -> str:
    return ("SELECT event_type, date_trunc('hour', ts) AS hour, "
            "COUNT(*) AS n FROM events GROUP BY event_type, hour "
            "ORDER BY event_type, hour")


def sql_kg_gazetteer_mentions() -> str:
    """Mirror of queries.kg_gazetteer_mentions: join transcripts
    against the nation/region alias vocabulary with a word-bounded
    regex over the lowercased text, count distinct mentioning turns."""
    kg = _sql_str(KG)
    return f"""
WITH {transcripts_cte()},
aliases AS (
  SELECT n_name AS name,
         'place-' || replace(lower(n_name), ' ', '_') AS slug FROM nation
  UNION ALL
  SELECT r_name, 'region-' || replace(lower(r_name), ' ', '_') FROM region)
SELECT {kg} || a.slug AS entity, a.name AS surface,
       CAST(COUNT(DISTINCT t.conv_id || '-t' || t.turn_idx) AS BIGINT)
         AS n_turns
FROM transcripts t
JOIN aliases a
  ON regexp_matches(lower(t.text), '\\b' || lower(a.name) || '\\b')
GROUP BY 1, 2 ORDER BY entity"""


def _ngram_list_sql(padded_expr: str) -> str:
    """DuckDB list of character n-grams (n in [2,4], with duplicates)
    of an already-^$-padded string expression — mirrors
    stages.ner.char_ngrams exactly (i in 0..len-k -> substr 1-based)."""
    parts = [
        f"list_transform(range(1, len({padded_expr}) - {k - 2}), "
        f"i -> substr({padded_expr}, CAST(i AS INTEGER), {k}))"
        for k in (2, 3, 4)
    ]
    return " || ".join(parts)


def sql_kg_ner_mentions() -> str:
    """Mirror of queries.kg_ner_mentions: the ENTIRE naive-Bayes
    train+score pipeline re-expressed in SQL — training n-gram counts
    from the same nation/region tables + the same background word
    list, identical md5 feature hashing (stages/ner.py contract),
    Laplace ln-arithmetic, argmax with (score DESC, label ASC)
    tie-break matching numpy argmax over sorted classes.  Output is
    strings + BIGINT only, so float summation-order differences cannot
    perturb the value hash (the argmax margins are O(1))."""
    from ..stages.ner import DEFAULT_BACKGROUND, N_FEATURES

    bg = ",\n    ".join(f"({_sql_str(w)})" for w in DEFAULT_BACKGROUND)
    feat = ("CAST(('0x' || substr(md5(g), 1, 16)) AS UBIGINT) % "
            f"{N_FEATURES}")
    cand_re = _sql_str(r"\b[A-Z][A-Z0-9_]+(?: [A-Z][A-Z0-9_]+)*\b")
    return f"""
WITH {transcripts_cte()},
train AS (
  SELECT lower(n_name) AS ex, 'place' AS label FROM nation
  UNION ALL SELECT lower(r_name), 'region' FROM region
  UNION ALL SELECT w, 'background' FROM (VALUES
    {bg}) AS b(w)),
priors AS (
  SELECT label,
         ln(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM train)) AS lp
  FROM train GROUP BY label),
tgrams AS (
  SELECT label, unnest({_ngram_list_sql("p")}) AS g
  FROM (SELECT label, '^' || ex || '$' AS p FROM train)),
tfeat AS (SELECT label, {feat} AS f FROM tgrams),
counts AS (
  SELECT label, f, CAST(COUNT(*) AS DOUBLE) AS c
  FROM tfeat GROUP BY label, f),
totals AS (
  SELECT label, CAST(COUNT(*) AS DOUBLE) AS tot
  FROM tfeat GROUP BY label),
cands AS (
  SELECT conv_id, turn_idx,
         unnest(regexp_extract_all(text, {cand_re})) AS mention
  FROM transcripts),
cand_turns AS (SELECT DISTINCT conv_id, turn_idx, mention FROM cands),
spans AS (SELECT DISTINCT mention FROM cands),
sfeat AS (
  SELECT mention, {feat} AS f
  FROM (SELECT mention, unnest({_ngram_list_sql("p")}) AS g
        FROM (SELECT mention, '^' || lower(mention) || '$' AS p
              FROM spans))),
scored AS (
  SELECT s.mention, t.label,
         ANY_VALUE(p.lp)
           + SUM(ln(COALESCE(c.c, 0) + 1) - ln(t.tot + {N_FEATURES}))
           AS score
  FROM sfeat s
  CROSS JOIN totals t
  JOIN priors p ON p.label = t.label
  LEFT JOIN counts c ON c.label = t.label AND c.f = s.f
  GROUP BY s.mention, t.label, t.tot),
best AS (
  SELECT mention, label,
         row_number() OVER (PARTITION BY mention
                            ORDER BY score DESC, label ASC) AS rn
  FROM scored)
SELECT ct.mention, b.label,
       CAST(COUNT(*) AS BIGINT) AS n_turns
FROM cand_turns ct
JOIN best b ON b.mention = ct.mention AND b.rn = 1
WHERE b.label <> 'background'
GROUP BY 1, 2 ORDER BY 1, 2"""


_EN_STOP = ("the", "and", "of", "to", "a", "in", "is", "it", "you", "that")
_DE_STOP = ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu")
_FR_STOP = ("le", "la", "les", "et", "est", "un", "une", "dans", "pour")
_ES_STOP = ("el", "la", "los", "y", "es", "un", "una", "en", "por", "que")


def _stop_list(words) -> str:
    return "[" + ", ".join(_sql_str(w) for w in words) + "]"


def sql_doc_quality() -> str:
    """Mirror of stages.textops.QualityScorer (ASCII corpus: RE2's \\w
    and Python's unicode \\w coincide)."""
    stop = _stop_list(_EN_STOP)
    return f"""
WITH d AS (
  SELECT doc_id, text,
         string_split_regex(trim(lower(text)), '\\s+') AS toks,
         trim(text) = '' AS empty
  FROM documents)
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(CASE WHEN empty THEN 0 ELSE len(toks) END AS BIGINT) AS n_tokens,
  CAST(length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS DOUBLE)
    / greatest(length(text), 1) AS punct_ratio,
  CASE WHEN empty THEN 0.0 ELSE
    CAST(len(list_filter(toks, t -> list_contains({stop}, t))) AS DOUBLE)
      / greatest(len(toks), 1) END AS stopword_ratio,
  CASE WHEN empty THEN 0.0 ELSE
    CAST(len(list_distinct(toks)) AS DOUBLE)
      / greatest(len(toks), 1) END AS distinct_token_ratio
FROM d ORDER BY doc_id"""


def sql_doc_langid() -> str:
    """Mirror of stages.textops.LangId: distinct-token ∩ stopword-set
    score, argmax with alphabetical tie priority (de<en<es<fr), 0 ->
    'unknown'."""
    scores = {
        "de": _stop_list(_DE_STOP), "en": _stop_list(_EN_STOP),
        "es": _stop_list(_ES_STOP), "fr": _stop_list(_FR_STOP),
    }
    score_cols = ",\n  ".join(
        f"len(list_filter(toks, t -> list_contains({lst}, t))) AS s_{lang}"
        for lang, lst in scores.items())
    return f"""
WITH d AS (
  SELECT doc_id,
         list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks
  FROM documents),
s AS (SELECT doc_id,
  {score_cols}
  FROM d)
SELECT doc_id,
  CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
       WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
       WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
       WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
       ELSE 'fr' END AS pred_lang
FROM s ORDER BY doc_id"""


def sql_doc_sample_stratified(rates: dict = None,
                              default_rate: float = 0.05) -> str:
    """Mirror of queries.doc_sample_stratified: the sql_doc_langid
    strata, the identical md5-low64 row hash over CAST(doc_id AS
    VARCHAR), and the same integer thresholds (rate * 1e6) — so the
    kept set is bit-for-bit reproducible on both engines."""
    rates = rates if rates is not None else {"en": 0.3, "unknown": 1.0}
    denom = 1_000_000
    h = _MD5_LOW64.format(expr="CAST(doc_id AS VARCHAR)")
    cases = " ".join(
        f"WHEN {_sql_str(k)} THEN {int(round(v * denom))}"
        for k, v in sorted(rates.items()))
    return f"""
WITH langs AS ({sql_doc_langid()})
SELECT doc_id, pred_lang FROM langs
WHERE (({h} >> 1) % {denom})
      < CASE pred_lang {cases}
        ELSE {int(round(default_rate * denom))} END
ORDER BY doc_id"""


def sql_doc_corpus_mix(doc_rate: float = 0.3, turn_rate: float = 0.1,
                       token_budget: int = 40_000,
                       weights=(("docs", 7, 10), ("turns", 3, 10))) -> str:
    """Mirror of queries.doc_corpus_mix: the derived transcripts CTE,
    UNION ALL with the same source tags / disjoint key spaces, the
    identical md5 hash + integer thresholds (rate leg), and the
    budget leg's thresholds re-derived from per-source token totals in
    the SAME exact integer arithmetic (``//`` floor division on
    bigints — no float rounding anywhere)."""
    denom = 1_000_000
    h = _MD5_LOW64.format(expr="mix_key")
    wrows = ", ".join(f"('{s}', {wn}, {wd})" for s, wn, wd in weights)
    return f"""
WITH {transcripts_cte()},
pool AS (
  SELECT 'docs' AS source,
         'd' || CAST(doc_id AS VARCHAR) AS mix_key, text FROM documents
  UNION ALL
  SELECT 'turns',
         't' || conv_id || '-' || CAST(turn_idx AS VARCHAR), text
  FROM transcripts),
tot AS (
  SELECT source,
         SUM(CAST(length(regexp_extract_all(
             text, '[^ \\t\\n\\r\\f\\v]+')) AS BIGINT)) AS tokens
  FROM pool GROUP BY source),
w(source, wn, wd) AS (VALUES {wrows}),
thr AS (
  SELECT w.source,
         CASE WHEN COALESCE(tot.tokens, 0) = 0 THEN 0
              ELSE LEAST({denom}, (CAST(w.wn AS BIGINT) * {token_budget}
                                   * {denom})
                                  // (CAST(w.wd AS BIGINT) * tot.tokens))
         END AS thr
  FROM w LEFT JOIN tot ON w.source = tot.source)
SELECT source, 'rate' AS metric, mix_key, text FROM pool
WHERE (({h} >> 1) % {denom})
      < CASE source WHEN 'docs' THEN {int(round(doc_rate * denom))}
                    WHEN 'turns' THEN {int(round(turn_rate * denom))}
                    ELSE 0 END
UNION ALL
SELECT p.source, 'budget', p.mix_key, p.text
FROM pool p JOIN thr ON p.source = thr.source
WHERE (({h.replace('mix_key', 'p.mix_key')} >> 1) % {denom}) < thr.thr"""


def sql_doc_corpus_clean(min_tokens: int = 20,
                         min_distinct_ratio: float = 0.2) -> str:
    """Mirror of queries.doc_corpus_clean: quality + language filters,
    then exact text dedup keeping the min doc_id."""
    score_cols = ",\n    ".join(
        f"len(list_filter(dtoks, t -> list_contains({_stop_list(lst)}, t)))"
        f" AS s_{lang}"
        for lang, lst in (("de", _DE_STOP), ("en", _EN_STOP),
                          ("es", _ES_STOP), ("fr", _FR_STOP)))
    return f"""
WITH scored AS (
  SELECT doc_id, text,
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END
      AS n_tokens,
    list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS dtoks
  FROM documents),
s AS (
  SELECT doc_id, text, n_tokens,
    CASE WHEN n_tokens = 0 THEN 0.0
         ELSE CAST(len(dtoks) AS DOUBLE) / n_tokens END AS distinct_ratio,
    {score_cols}
  FROM scored),
kept AS (
  SELECT doc_id, text, n_tokens FROM s
  WHERE n_tokens >= {min_tokens}
    AND distinct_ratio >= {min_distinct_ratio}
    AND greatest(s_de, s_en, s_es, s_fr) > 0
    AND s_en = greatest(s_de, s_en, s_es, s_fr)
    AND s_de < greatest(s_de, s_en, s_es, s_fr))
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(min(n_tokens) AS BIGINT) AS n_tokens
FROM kept GROUP BY text ORDER BY doc_id"""


_MD5_LOW64 = "CAST(('0x' || substr(md5({expr}), 1, 16)) AS UBIGINT)"


def sql_doc_simhash() -> str:
    """Mirror of stages.dedup.SimHasher: leading-64-bit md5 token hashes,
    majority vote over bits 0..62."""
    h = _MD5_LOW64.format(expr="tok")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents WHERE trim(text) <> ''),
th AS (SELECT doc_id, {h} AS h FROM toks),
bits AS (
  SELECT doc_id, b.bit,
         CASE WHEN (h >> CAST(b.bit AS INTEGER)) & 1 = 1
              THEN 1 ELSE -1 END AS v
  FROM th CROSS JOIN (SELECT unnest(range(63)) AS bit) b),
scores AS (SELECT doc_id, bit, sum(v) AS s FROM bits GROUP BY doc_id, bit)
SELECT doc_id,
  CAST(sum(CASE WHEN s > 0
                THEN CAST(1 AS UBIGINT) << CAST(bit AS INTEGER)
                ELSE 0 END) AS BIGINT) AS simhash
FROM scores GROUP BY doc_id
UNION ALL
SELECT doc_id, CAST(0 AS BIGINT) AS simhash
FROM documents WHERE trim(text) = ''
ORDER BY doc_id"""


def sql_doc_jaccard_pairs(threshold: float = 0.5,
                          shingle_k: int = 3) -> str:
    """Mirror of queries.doc_jaccard_pairs: the same k-token shingle
    derivation as sql_doc_minhash_clusters (short docs collapse to one
    whole-text gram), an inverted-index self-join for candidates, and
    exact intersection/union counts.  The Jaccard filter divides the
    same two BIGINTs as the Ray side, so the kept set is identical."""
    k = shingle_k
    return f"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents),
sh AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= {k}
         THEN list_distinct(list_transform(range(len(toks) - {k - 1}),
                            i -> array_to_string(toks[i+1:i+{k}], ' ')))
         ELSE [array_to_string(toks, ' ')] END AS grams
  FROM d),
sizes AS (SELECT doc_id, len(grams) AS n FROM sh),
inv AS (SELECT doc_id, unnest(grams) AS g FROM sh),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
j AS (
  SELECT c.id_a, c.id_b, CAST(c.n_inter AS BIGINT) AS n_inter,
         CAST(sa.n + sb.n - c.n_inter AS BIGINT) AS n_union
  FROM cand c JOIN sizes sa ON sa.doc_id = c.id_a
              JOIN sizes sb ON sb.doc_id = c.id_b)
SELECT id_a, id_b, n_inter, n_union
FROM j WHERE n_inter * 1.0 / n_union >= {threshold}
ORDER BY id_a, id_b"""


def sql_doc_simhash_pairs(max_hamming: int = 3) -> str:
    """Mirror of queries.doc_simhash_pairs: signatures from the
    sql_doc_simhash derivation, pair set from an all-pairs self-join
    filtered on bit_count(xor(...)) — exact at oracle scale, where the
    Ray side's banded LSH has recall 1.0 over the signature space by
    the pigeonhole split, so the two pair sets coincide."""
    return f"""
WITH sigs AS ({sql_doc_simhash()})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {int(max_hamming)}
ORDER BY id_a, id_b"""


def sql_doc_fingerprints(k: int = 3) -> str:
    """Mirror of stages.textops.Fingerprinter: min 63-bit (leading) md5 hash over
    k-token shingle windows."""
    h = _MD5_LOW64.format(expr="g")
    return f"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents),
s AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= {k}
         THEN list_transform(range(len(toks) - {k - 1}),
                             i -> array_to_string(toks[i+1:i+{k}], ' '))
         ELSE [array_to_string(toks, ' ')] END AS grams
  FROM d)
SELECT doc_id, min(CAST({h} >> 1 AS BIGINT)) AS fingerprint
FROM (SELECT doc_id, unnest(grams) AS g FROM s)
GROUP BY doc_id ORDER BY doc_id"""


def sql_multimodal_decode(num_items: int = 64, seed: int = 42) -> str:
    """VALUES mirror of queries.multimodal_decode: the synthetic media
    table and the fake decode are deterministic (seeded generator +
    content-hash dims), so the expected rows are re-derived here by an
    independent replication of those formulas (same
    single-source-of-truth pattern as seed_schema_values_sql)."""
    import hashlib

    import numpy as np

    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(num_items):
        payload = rng.bytes(256 + (i % 7) * 64)
        digest = hashlib.blake2b(payload, digest_size=16).digest()
        rows.append((i, kinds[i % 3], 16 + digest[0], 16 + digest[1],
                     len(payload)))
    values = ",\n  ".join(
        f"(CAST({m} AS BIGINT), {_sql_str(kd)}, CAST({w} AS INTEGER), "
        f"CAST({h} AS INTEGER), CAST({n} AS BIGINT))"
        for m, kd, w, h, n in rows)
    return (f"SELECT * FROM (VALUES\n  {values}\n) "
            "AS m(media_id, kind, width, height, n_bytes) ORDER BY media_id")


def sql_events_asof_join(left_type: str = "purchase",
                         right_type: str = "view") -> str:
    """Mirror of queries.events_asof_join via DuckDB's native ASOF
    JOIN.  The right side is pre-deduped on (user_id, ts) keeping max
    event_id — identical tie rule to the merge_asof implementation, so
    the engines cannot disagree on an arbitrary equal-timestamp pick."""
    return f"""
WITH l AS (
  SELECT event_id, ts, user_id FROM events
  WHERE event_type = {_sql_str(left_type)}),
r0 AS (
  SELECT event_id, ts, user_id,
         row_number() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = {_sql_str(right_type)}),
r AS (SELECT event_id, ts, user_id FROM r0 WHERE rn = 1)
SELECT l.event_id, l.user_id, l.ts,
       r.event_id AS prior_event_id, r.ts AS prior_ts
FROM l ASOF JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id"""


def sql_events_range_join(left_type: str = "purchase",
                          right_type: str = "view",
                          window_minutes: int = 360) -> str:
    """Mirror of queries.events_range_join — a theta join DuckDB plans
    as its native IEJoin range join.  Bounds match the stage exactly:
    ``r.ts >= l.ts - window AND r.ts < l.ts`` (strictly earlier, so
    equal-timestamp pairs are excluded on both engines)."""
    return f"""
WITH l AS (
  SELECT event_id, ts, user_id FROM events
  WHERE event_type = {_sql_str(left_type)}),
r AS (
  SELECT event_id, ts, user_id FROM events
  WHERE event_type = {_sql_str(right_type)})
SELECT l.event_id, l.user_id, l.ts,
       r.event_id AS matched_event_id, r.ts AS matched_ts
FROM l JOIN r ON l.user_id = r.user_id
 AND r.ts >= l.ts - INTERVAL {int(window_minutes)} MINUTE
 AND r.ts < l.ts
ORDER BY l.event_id, matched_event_id"""


def sql_events_lag() -> str:
    """Mirror of queries.events_lag: lag() with the identical
    (ts, event_id) order, inner (first events dropped on both engines
    — nullable outputs stringify differently across engines)."""
    return """
WITH l AS (
  SELECT event_id, user_id, ts,
         lag(event_id) OVER w AS prev_event_id,
         lag(ts) OVER w AS prev_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_id, user_id, ts,
       CAST(prev_event_id AS BIGINT) AS prev_event_id, prev_ts
FROM l WHERE prev_event_id IS NOT NULL ORDER BY event_id"""


def sql_events_lead() -> str:
    """Mirror of queries.events_lead: lead() with the identical
    (ts, event_id) order, inner (last events dropped on both
    engines)."""
    return """
WITH l AS (
  SELECT event_id, user_id, ts,
         lead(event_id) OVER w AS next_event_id,
         lead(ts) OVER w AS next_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_id, user_id, ts,
       CAST(next_event_id AS BIGINT) AS next_event_id, next_ts
FROM l WHERE next_event_id IS NOT NULL ORDER BY event_id"""


def sql_events_topk_per_user(k: int = 3) -> str:
    """Mirror of queries.events_topk_per_user: row_number() with the
    identical (ts DESC, event_id DESC) order, so ties cannot differ."""
    return f"""
WITH r AS (
  SELECT event_id, ts, user_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT event_id, ts, user_id FROM r WHERE rn <= {int(k)}
ORDER BY user_id, event_id"""


def sql_events_sliding_counts(window_minutes: int = 30) -> str:
    """Mirror of queries.events_sliding_counts via a SQL window
    function.  RANGE frames include equal-timestamp peers, so the
    count is deterministic under ties on both engines."""
    return f"""
SELECT event_id, user_id, ts,
       count(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL {int(window_minutes)} MINUTE
                      PRECEDING AND CURRENT ROW) AS n_window
FROM events ORDER BY event_id"""


def sql_multimodal_frames(num_items: int = 64, seed: int = 42,
                          n_frames: int = 4, fps: float = 2.0) -> str:
    """VALUES mirror of queries.multimodal_frames — the seeded media
    generator and the blake2b(payload || frame_idx) fake frame are
    re-derived independently here (same single-source-of-truth pattern
    as sql_multimodal_decode)."""
    import hashlib

    import numpy as np

    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(num_items):
        payload = rng.bytes(256 + (i % 7) * 64)
        if kinds[i % 3] != "video":
            continue
        for f in range(n_frames):
            frame = hashlib.blake2b(payload + f.to_bytes(4, "big"),
                                    digest_size=64).digest()
            rows.append((i, f, f / fps, frame[:8].hex()))
    values = ",\n  ".join(
        f"(CAST({m} AS BIGINT), CAST({f} AS BIGINT), "
        f"CAST({t} AS DOUBLE), {_sql_str(hx)})"
        for m, f, t, hx in rows)
    return (f"SELECT * FROM (VALUES\n  {values}\n) "
            "AS fr(media_id, frame_idx, ts_sec, frame_hex) "
            "ORDER BY media_id, frame_idx")


def sql_ann_topk(query_vec_id: int = 0, k: int = 10) -> str:
    """Brute-force cosine top-k against one stored query vector."""
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_vec_id})
SELECT e.vec_id,
       CAST(rank() OVER (ORDER BY list_cosine_similarity(e.embedding, q.qv)
            DESC, e.vec_id) AS BIGINT) AS rnk
FROM embeddings e, q
WHERE e.vec_id <> {query_vec_id}
QUALIFY rnk <= {k}
ORDER BY rnk"""


# ---------------------------------------------------------------------------
# distributed graph-op oracles
# ---------------------------------------------------------------------------

_LOCALNAME = "regexp_extract({col}, '([^#/]+)$', 1)"


def sql_kg_classes() -> str:
    t = _sql_str(RDF_TYPE)
    cls = _sql_str("http://www.w3.org/2002/07/owl#Class")
    lbl = _sql_str(LABEL)
    cmt = _sql_str("http://www.w3.org/2000/01/rdf-schema#comment")
    sub = _sql_str("http://www.w3.org/2000/01/rdf-schema#subClassOf")
    name = _LOCALNAME.format(col="c.subject")
    return (kg_triples_cte() + f"""
SELECT c.subject, {name} AS name,
       coalesce(l.label, '') AS label, coalesce(cm.comment, '') AS comment,
       CAST(coalesce(p.n, 0) AS BIGINT) AS n_parents,
       CAST(coalesce(ch.n, 0) AS BIGINT) AS n_children
FROM (SELECT DISTINCT subject FROM triples
      WHERE predicate = {t} AND object = {cls}) c
LEFT JOIN (SELECT subject, min(object) AS label FROM triples
           WHERE predicate = {lbl} GROUP BY subject) l ON l.subject = c.subject
LEFT JOIN (SELECT subject, min(object) AS comment FROM triples
           WHERE predicate = {cmt} GROUP BY subject) cm ON cm.subject = c.subject
LEFT JOIN (SELECT subject, COUNT(DISTINCT object) AS n FROM triples
           WHERE predicate = {sub} AND object_kind = 'uri'
           GROUP BY subject) p ON p.subject = c.subject
LEFT JOIN (SELECT object AS subject, COUNT(DISTINCT subject) AS n FROM triples
           WHERE predicate = {sub} AND object_kind = 'uri'
           GROUP BY object) ch ON ch.subject = c.subject
ORDER BY name""")


def sql_kg_individuals_by_class() -> str:
    t = _sql_str(RDF_TYPE)
    ni = _sql_str("http://www.w3.org/2002/07/owl#NamedIndividual")
    return (kg_triples_cte() + f"""
SELECT t2.object AS class_uri, COUNT(DISTINCT t2.subject) AS n_individuals
FROM triples t1 JOIN triples t2 ON t1.subject = t2.subject
WHERE t1.predicate = {t} AND t1.object = {ni}
  AND t2.predicate = {t} AND t2.object <> {ni} AND t2.object_kind = 'uri'
GROUP BY t2.object ORDER BY class_uri""")


def sql_kg_inferred_types() -> str:
    """RDFS closure oracle: recursive CTE over subClassOf + domain/
    range typing (rules rdfs2/3/9/11)."""
    t = _sql_str(RDF_TYPE)
    sub = _sql_str("http://www.w3.org/2000/01/rdf-schema#subClassOf")
    dom = _sql_str("http://www.w3.org/2000/01/rdf-schema#domain")
    rng = _sql_str("http://www.w3.org/2000/01/rdf-schema#range")
    cte = kg_triples_cte().replace("WITH ", "WITH RECURSIVE ", 1)
    return (cte + f""",
sub_edges AS (
  SELECT subject AS child, object AS parent FROM triples
  WHERE predicate = {sub} AND object_kind = 'uri'),
anc AS (
  SELECT child, parent FROM sub_edges
  UNION
  SELECT a.child, s.parent FROM anc a JOIN sub_edges s ON a.parent = s.child),
base_types AS (
  SELECT subject, object AS cls FROM triples
  WHERE predicate = {t} AND object_kind = 'uri'
  UNION
  SELECT tr.subject, d.object FROM triples tr
  JOIN triples d ON tr.predicate = d.subject AND d.predicate = {dom}
  UNION
  SELECT tr.object, r.object FROM triples tr
  JOIN triples r ON tr.predicate = r.subject AND r.predicate = {rng}
  WHERE tr.object_kind = 'uri'),
all_types AS (
  SELECT subject, cls FROM base_types
  UNION
  SELECT b.subject, a.parent FROM base_types b JOIN anc a ON b.cls = a.child)
SELECT DISTINCT subject, cls AS type_uri FROM all_types
ORDER BY subject, type_uri""")


def sql_kg_ntriples() -> str:
    """N-Triples formatting oracle. Escapes backslash and quote (the
    only escapable characters present in this corpus; the Python sink
    additionally escapes \\n/\\r/\\t)."""
    xsd_string = _sql_str("http://www.w3.org/2001/XMLSchema#string")
    return (kg_triples_cte() + f"""
SELECT
  CASE WHEN subject LIKE '_:%' THEN subject ELSE '<' || subject || '>' END
  || ' <' || predicate || '> '
  || CASE WHEN object_kind = 'uri' THEN '<' || object || '>'
          WHEN object_kind = 'bnode' THEN object
          ELSE '"' || replace(replace(object, chr(92), chr(92) || chr(92)),
                              '"', chr(92) || '"') || '"'
               || CASE WHEN lang <> '' THEN '@' || lang
                       WHEN datatype <> '' AND datatype <> {xsd_string}
                         THEN '^^<' || datatype || '>'
                       ELSE '' END
     END || ' .' AS line
FROM triples ORDER BY line""")


def sql_kg_rename_refs(old_local: str = "place-nation_1",
                       new_local: str = "place-nation_1-canonical") -> str:
    old = _sql_str(KG + old_local)
    new = _sql_str(KG + new_local)
    return (kg_triples_cte() + f"""
SELECT CASE WHEN subject = {old} THEN {new} ELSE subject END AS subject,
       predicate,
       CASE WHEN object = {old} AND object_kind = 'uri' THEN {new}
            ELSE object END AS object
FROM triples
WHERE subject = {old} OR (object = {old} AND object_kind = 'uri')
ORDER BY subject, predicate, object""")


def sql_kg_diff_ts_stats() -> str:
    return (kg_triples_cte() + f"""
SELECT CAST((SELECT COUNT(*) FROM transcripts) AS BIGINT) AS added,
       CAST(0 AS BIGINT) AS removed,
       CAST(0 AS BIGINT) AS bnode_added,
       CAST(0 AS BIGINT) AS bnode_removed,
       CAST((SELECT COUNT(*) FROM triples)
            - (SELECT COUNT(*) FROM transcripts) AS BIGINT) AS unchanged""")


def sql_kg_detect_conflicts() -> str:
    lbl = _sql_str(LABEL)
    tool_prefix = _sql_str(KG + "tool-%")
    return (kg_triples_cte() + f"""
SELECT DISTINCT subject, predicate, 'renamed ' || object AS incoming_value
FROM triples
WHERE predicate = {lbl} AND subject LIKE {tool_prefix}
ORDER BY subject, predicate""")


def sql_events_sessionize(gap_minutes: int = 30) -> str:
    return f"""
WITH ordered AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL {gap_minutes} MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events, MIN(ts) AS start_ts, MAX(ts) AS end_ts
FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id"""


def sql_kg_viz_nodes(max_nodes: int = 500) -> str:
    t = _sql_str(RDF_TYPE)
    ni = _sql_str(NAMED_INDIVIDUAL)
    return (kg_triples_cte() + f"""
SELECT subject, MIN(object) AS node_type FROM triples
WHERE predicate = {t} AND object_kind = 'uri' AND object <> {ni}
GROUP BY subject ORDER BY subject LIMIT {max_nodes}""")


def sql_kg_annotations(entity_local: str = "place-nation_1") -> str:
    from ..functions.terms import STRUCTURAL_PREDICATES

    uri = _sql_str(KG + entity_local)
    blist = ", ".join(_sql_str(p) for p in sorted(STRUCTURAL_PREDICATES))
    return (kg_triples_cte() + f"""
SELECT predicate, object, lang, datatype FROM triples
WHERE subject = {uri} AND predicate NOT IN ({blist})
ORDER BY predicate, object""")


def sql_kg_annotation_predicates() -> str:
    from ..functions.terms import STRUCTURAL_PREDICATES

    blist = ", ".join(_sql_str(p) for p in sorted(STRUCTURAL_PREDICATES))
    return (kg_triples_cte() + f"""
SELECT DISTINCT predicate FROM triples
WHERE object_kind = 'literal' AND predicate NOT IN ({blist})
ORDER BY predicate""")


def sql_doc_corpus_near_clean() -> str:
    """Mirror of queries.doc_corpus_near_clean: the full MinHash
    cluster derivation reduced to one representative (= min id = the
    cluster label) per cluster with its size."""
    return f"""
WITH clusters AS ({sql_doc_minhash_clusters()})
SELECT CAST(cluster AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS cluster_size
FROM clusters GROUP BY cluster ORDER BY doc_id"""


def sql_doc_minhash_clusters(num_perm: int = 64, num_bands: int = 16,
                             shingle_k: int = 3,
                             threshold: float = 0.7) -> str:
    """Exact DuckDB mirror of the whole distributed MinHash pipeline in
    md5 hash mode (stages.dedup.minhash_dedup_clusters_ds): 3-token
    shingles -> leading-64-bit md5 shingle hashes -> 64 affine minhash
    permutations (uint64 wraparound then mod the Mersenne prime, as
    numpy computes it) -> 16 band hashes (md5 of the comma-joined
    signature slice, >> 1) -> candidate pairs per band bucket -> exact
    Jaccard verify over the shingle-hash sets -> connected components
    via a recursive transitive closure -> (doc_id, cluster = min id in
    component).  The permutation table is re-derived here independently
    from the published seed (np.random.RandomState(7))."""
    import numpy as np

    rows_per_band = num_perm // num_bands
    m = (1 << 61) - 1
    rng = np.random.RandomState(7)
    a = rng.randint(1, m, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, m, size=num_perm, dtype=np.uint64)
    perm_rows = ",\n    ".join(
        f"({i}, CAST({int(a[i])} AS UBIGINT), CAST({int(b[i])} AS UBIGINT))"
        for i in range(num_perm))
    k = shingle_k
    h = _MD5_LOW64.format(expr="g")
    hstr = _MD5_LOW64.format(expr="sig_str")
    return f"""
WITH RECURSIVE perms(perm_id, a, b) AS (VALUES
    {perm_rows}),
d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents),
sh AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= {k}
         THEN list_distinct(list_transform(range(len(toks) - {k - 1}),
                            i -> array_to_string(toks[i+1:i+{k}], ' ')))
         ELSE [array_to_string(toks, ' ')] END AS grams
  FROM d),
hs AS (
  SELECT doc_id, unnest(grams) AS g FROM sh),
hv AS (
  SELECT doc_id, {h} AS x FROM hs),
hlists AS (
  SELECT doc_id, list(x) AS hlist, count(*) AS n_sh FROM hv GROUP BY doc_id),
sig AS (
  SELECT hv.doc_id, p.perm_id,
    min(CAST((((CAST(p.a AS HUGEINT) * hv.x) % 18446744073709551616
               + p.b) % 18446744073709551616)
             % 2305843009213693951 AS UBIGINT)) AS mh
  FROM hv CROSS JOIN perms p GROUP BY hv.doc_id, p.perm_id),
band AS (
  SELECT doc_id, perm_id // {rows_per_band} AS band_id,
         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY perm_id) AS sig_str
  FROM sig GROUP BY doc_id, perm_id // {rows_per_band}),
bh AS (
  SELECT doc_id, band_id,
         CAST({hstr} >> 1 AS BIGINT) AS band_hash
  FROM band),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bh x JOIN bh y
    ON x.band_id = y.band_id AND x.band_hash = y.band_hash
   AND x.doc_id < y.doc_id),
ver AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN hlists ha ON ha.doc_id = c.id_a
  JOIN hlists hb ON hb.doc_id = c.id_b
  WHERE CAST(len(list_intersect(ha.hlist, hb.hlist)) AS DOUBLE)
        / (ha.n_sh + hb.n_sh
           - len(list_intersect(ha.hlist, hb.hlist))) >= {threshold}),
sym(a, b) AS (
  SELECT id_a, id_b FROM ver UNION SELECT id_b, id_a FROM ver),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
labels AS (
  SELECT a AS node, least(a, min(b)) AS label FROM reach GROUP BY a)
SELECT CAST(doc.doc_id AS BIGINT) AS doc_id,
       CAST(COALESCE(l.label, doc.doc_id) AS BIGINT) AS cluster
FROM documents doc LEFT JOIN labels l ON doc.doc_id = l.node
ORDER BY doc_id"""


def sql_embedding_dedup_clusters(threshold: float = 0.45) -> str:
    """Mirror of queries.embedding_dedup_clusters: the
    sql_embedding_near_dups pair set closed into connected components
    with the same recursive transitive closure as
    sql_doc_minhash_clusters; singletons keep their own id."""
    return f"""
WITH RECURSIVE ver AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b
  FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
  WHERE list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                               CAST(y.embedding AS DOUBLE[]))
        >= {threshold}),
sym(a, b) AS (
  SELECT id_a, id_b FROM ver UNION SELECT id_b, id_a FROM ver),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
labels AS (
  SELECT a AS node, least(a, min(b)) AS label FROM reach GROUP BY a)
SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
       CAST(COALESCE(l.label, e.vec_id) AS BIGINT) AS cluster
FROM embeddings e LEFT JOIN labels l ON e.vec_id = l.node
ORDER BY vec_id"""


def sql_embedding_near_dups(threshold: float = 0.45) -> str:
    """Mirror of queries.embedding_near_dups: all-pairs cosine >=
    threshold over the embeddings table (the Ray side's exact blocked-
    broadcast strategy at oracle scale).  Pair set only — see the query
    docstring for why the float cosine itself is not compared."""
    return f"""
SELECT x.vec_id AS id_a, y.vec_id AS id_b
FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
WHERE list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                             CAST(y.embedding AS DOUBLE[])) >= {threshold}
ORDER BY id_a, id_b"""

# ---------------------------------------------------------------------------
# consolidated driver-slot oracles (the driver caps at 50 query slots;
# thin sibling queries share one tagged-union slot — VERDICT r3 item 1)
# ---------------------------------------------------------------------------


def sql_events_lag_lead() -> str:
    """Mirror of queries.events_lag_lead: lag() + lead() over the same
    window, tagged and unioned with unified other_* column names."""
    return """
WITH l AS (
  SELECT event_id, user_id, ts,
         lag(event_id) OVER w AS prev_event_id,
         lag(ts) OVER w AS prev_ts,
         lead(event_id) OVER w AS next_event_id,
         lead(ts) OVER w AS next_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT 'prev' AS direction, event_id, user_id, ts,
       CAST(prev_event_id AS BIGINT) AS other_event_id,
       prev_ts AS other_ts
FROM l WHERE prev_event_id IS NOT NULL
UNION ALL
SELECT 'next' AS direction, event_id, user_id, ts,
       CAST(next_event_id AS BIGINT) AS other_event_id,
       next_ts AS other_ts
FROM l WHERE next_event_id IS NOT NULL
ORDER BY direction, event_id"""


def sql_ann_search() -> str:
    """Mirror of queries.ann_search: brute-force + full-probe IVF
    top-k, method-tagged."""
    return f"""
SELECT 'brute' AS method, t.vec_id, t.rnk FROM ({sql_ann_topk(0, 10)}) t
UNION ALL
SELECT 'ivf' AS method, t.vec_id, t.rnk FROM ({sql_ann_topk(7, 10)}) t
ORDER BY method, rnk"""


def sql_doc_simhash_all(max_hamming: int = 3) -> str:
    """Mirror of queries.doc_simhash_all: signatures and near-dup pairs
    over a shared (part, id_a, id_b, val) shape."""
    return f"""
WITH sigs AS ({sql_doc_simhash()})
SELECT 'sig' AS part, doc_id AS id_a, CAST(-1 AS BIGINT) AS id_b,
       simhash AS val
FROM sigs
UNION ALL
SELECT 'pair' AS part, a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS val
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {int(max_hamming)}
ORDER BY part, id_a, id_b"""


def sql_multimodal_pipeline(num_items: int = 64, seed: int = 42,
                            n_frames: int = 4, fps: float = 2.0) -> str:
    """VALUES mirror of queries.multimodal_pipeline — decode + frame
    rows re-derived independently (same single-source-of-truth pattern
    as sql_multimodal_decode/frames) and serialized to the shared
    payload shape."""
    import hashlib

    import numpy as np

    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(num_items):
        payload = rng.bytes(256 + (i % 7) * 64)
        digest = hashlib.blake2b(payload, digest_size=16).digest()
        rows.append(("decode", i, -1,
                     f"{kinds[i % 3]}|{16 + digest[0]}|{16 + digest[1]}"
                     f"|{len(payload)}"))
        if kinds[i % 3] == "video":
            for f in range(n_frames):
                frame = hashlib.blake2b(payload + f.to_bytes(4, "big"),
                                        digest_size=64).digest()
                rows.append(("frames", i, f,
                             f"{float(f / fps)}|{frame[:8].hex()}"))
    # 'real' part: width/height/features re-derived from the
    # GENERATOR's RNG protocol (synthesize_media_dataset(real=True)
    # draws dims/pixels/samples in this exact call order) — NOT from
    # the codec under test, so the row only matches when the Ray side
    # round-trips actual PNG/WAV content.  n_bytes uses the encoder
    # (payload identity); video rows take the hash pseudo-decode
    # (mode='auto' semantics).
    rng = np.random.RandomState(seed)
    n_real = 24
    for i in range(n_real):
        kind = kinds[i % 3]
        if kind == "image":
            from ..sources.codecs import png_encode

            w = 16 + int(rng.randint(0, 48))
            h = 16 + int(rng.randint(0, 48))
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            payload = png_encode(img)
            px = img.reshape(-1, 3).astype(np.float64) / 255.0
            feat0 = float(px.mean(axis=0)[0])
            rows.append(("real", i, -1,
                         f"image|{w}|{h}|{len(payload)}|{feat0:.12f}"))
        elif kind == "audio":
            from ..sources.codecs import wav_encode

            n = 800 + int(rng.randint(0, 1600))
            t = np.arange(n)
            f0 = 5 + rng.randint(0, 40)
            s = (np.sin(t / f0) * 12000
                 + np.sin(t / (f0 * 2.7)) * 6000).astype(np.int16)
            payload = wav_encode(s, rate=16000)
            mono = s.astype(np.float64) / 32768.0
            rms = float(np.sqrt(np.mean(mono ** 2)))
            rows.append(("real", i, -1,
                         f"audio|{n}|1|{len(payload)}|{rms:.12f}"))
        else:
            payload = rng.bytes(256 + (i % 7) * 64)
            digest = hashlib.blake2b(payload, digest_size=16).digest()
            feats = np.frombuffer(hashlib.blake2b(
                payload, digest_size=64).digest(),
                dtype=np.uint64).astype(np.float64) / np.float64(2 ** 64)
            rows.append(("real", i, -1,
                         f"video|{16 + digest[0]}|{16 + digest[1]}"
                         f"|{len(payload)}|{float(feats[0]):.12f}"))
    values = ",\n  ".join(
        f"({_sql_str(p)}, CAST({m} AS BIGINT), CAST({it} AS BIGINT), "
        f"{_sql_str(pl)})"
        for p, m, it, pl in rows)
    return (f"SELECT * FROM (VALUES\n  {values}\n) "
            "AS mp(part, media_id, item, payload) "
            "ORDER BY part, media_id, item")


def sql_kg_annotations_all(entity_local: str = "place-nation_1") -> str:
    """Mirror of queries.kg_annotations_all: one entity's non-structural
    annotation rows plus the graph-wide distinct annotation predicates,
    part-tagged over a shared kg_triples_cte."""
    from ..functions.terms import STRUCTURAL_PREDICATES

    uri = _sql_str(KG + entity_local)
    blist = ", ".join(_sql_str(p) for p in sorted(STRUCTURAL_PREDICATES))
    return (kg_triples_cte() + f"""
SELECT 'ann' AS part, predicate, object, lang, datatype FROM triples
WHERE subject = {uri} AND predicate NOT IN ({blist})
UNION ALL
SELECT 'pred' AS part, predicate, '' AS object, '' AS lang, '' AS datatype
FROM (SELECT DISTINCT predicate FROM triples
      WHERE object_kind = 'literal' AND predicate NOT IN ({blist}))
ORDER BY part, predicate, object""")


def sql_kg_top_mentions_per_conversation(k: int = 3) -> str:
    """Mirror of queries.kg_top_mentions_per_conversation: mention
    triples -> (conversation, entity) counts -> row_number() head with
    the identical (n_mentions DESC, entity DESC) tie order."""
    return (kg_triples_cte() + f""",
mention_counts AS (
  SELECT regexp_replace(subject, '-t[0-9]+$', '') AS conv_uri,
         object AS entity, COUNT(*) AS n_mentions
  FROM triples WHERE predicate = {_sql_str(KG_MENTIONS)}
  GROUP BY 1, 2),
ranked AS (
  SELECT conv_uri, entity, n_mentions,
         row_number() OVER (PARTITION BY conv_uri
                            ORDER BY n_mentions DESC, entity DESC) AS rn
  FROM mention_counts)
SELECT conv_uri, entity, CAST(n_mentions AS BIGINT) AS n_mentions
FROM ranked WHERE rn <= {int(k)}
ORDER BY conv_uri, entity""")


def sql_doc_text_profile() -> str:
    """Mirror of stages.textops.TextProfile: the fused stage is
    column-identical to QualityScorer + LangId + Fingerprinter, so the
    oracle is the equijoin of their three mirrors."""
    return f"""
WITH q AS ({sql_doc_quality()}),
     l AS ({sql_doc_langid()}),
     f AS ({sql_doc_fingerprints()})
SELECT q.*, l.pred_lang, f.fingerprint
FROM q JOIN l USING (doc_id) JOIN f USING (doc_id)
ORDER BY doc_id"""


def sql_doc_pii_redact(mod: int = 4) -> str:
    """Mirror of stages.scrub.PiiRedactor(inject=True): the identical
    deterministic PII injection (pure function of doc_id), then
    per-pattern match counts on the injected text and the sequential
    regexp_replace chain in PII_PATTERNS order.  Both engines run RE2,
    so counts and redacted text agree byte-for-byte."""
    from ..stages.scrub import PII_PATTERNS

    count_cols = ",\n  ".join(
        f"CAST(len(regexp_extract_all(text, {_sql_str(pat)})) AS BIGINT)"
        f" AS n_{name}s"
        for name, pat, _ in PII_PATTERNS)
    red = "text"
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, {_sql_str(pat)}, {_sql_str(repl)}, 'g')"
    return f"""
WITH injected AS (
  SELECT doc_id,
    CASE WHEN doc_id % {mod} <> 0 THEN
      text || ' contact user' || CAST(doc_id AS VARCHAR)
           || '@example.com or +1 555-' || CAST(doc_id % 900 + 100 AS VARCHAR)
           || '-' || CAST((doc_id * 7) % 9000 + 1000 AS VARCHAR)
           || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
           || '.0.' || CAST((doc_id * 3) % 256 AS VARCHAR)
           || ' ref ' || CAST(doc_id * doc_id + 100000 AS VARCHAR)
    ELSE text END AS text
  FROM documents)
SELECT doc_id,
  {count_cols},
  {red} AS text_redacted
FROM injected ORDER BY doc_id"""


def sql_doc_ngram_contamination(k: int = 3, eval_mod: int = 97) -> str:
    """Mirror of queries.doc_ngram_contamination: distinct word
    k-grams on the explicit ASCII whitespace class (docs with < k
    tokens emit none), eval split = doc_id % eval_mod = 0; the engine
    counts gram HASHES where this counts gram strings — identical
    absent a 64-bit md5 collision."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\v]+'),
                     t -> t <> '') AS w
  FROM documents),
grams AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           unnest(list_transform(range(len(w) - {k - 1}),
                                 i -> array_to_string(w[i+1:i+{k}], ' '))) AS g
    FROM toks WHERE len(w) >= {k})),
eval_grams AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {eval_mod} = 0),
overlap AS (
  SELECT doc_id, 'eval_overlap' AS metric, CAST(COUNT(*) AS BIGINT) AS n
  FROM grams JOIN eval_grams USING (g)
  WHERE doc_id % {eval_mod} <> 0
  GROUP BY doc_id),
dup AS (
  SELECT doc_id, 'dup_grams' AS metric, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT doc_id, COUNT(*) OVER (PARTITION BY g) AS c FROM grams)
  WHERE c > 1 GROUP BY doc_id),
occ AS (
  SELECT doc_id, i, array_to_string(w[i+1:i+{k}], ' ') AS g FROM (
    SELECT doc_id, w, unnest(range(len(w) - {k - 1})) AS i
    FROM toks WHERE len(w) >= {k})),
dupocc AS (SELECT g FROM occ GROUP BY g HAVING COUNT(*) >= 2),
cov AS (
  SELECT DISTINCT doc_id, j FROM (
    SELECT occ.doc_id, unnest(range(occ.i, occ.i + {k})) AS j
    FROM occ JOIN dupocc USING (g))),
itokp AS (
  SELECT doc_id, tok, si - 1 AS j FROM (
    SELECT doc_id, unnest(w) AS tok,
           generate_subscripts(w, 1) AS si FROM toks)),
kept AS (
  SELECT itokp.doc_id, itokp.tok, itokp.j FROM itokp
  LEFT JOIN cov ON itokp.doc_id = cov.doc_id AND itokp.j = cov.j
  WHERE cov.doc_id IS NULL),
stripped AS (
  SELECT d.doc_id,
         'strip:' || substr(md5(COALESCE(
            string_agg(kept.tok, ' ' ORDER BY kept.j), '')), 1, 16)
           AS metric,
         CAST(COUNT(kept.tok) AS BIGINT) AS n
  FROM documents d LEFT JOIN kept ON d.doc_id = kept.doc_id
  GROUP BY d.doc_id),
ecov AS (
  SELECT DISTINCT doc_id, j FROM (
    SELECT occ.doc_id, unnest(range(occ.i, occ.i + {k})) AS j
    FROM occ JOIN eval_grams USING (g)
    WHERE occ.doc_id % {eval_mod} <> 0)),
ekept AS (
  SELECT itokp.doc_id, itokp.tok, itokp.j FROM itokp
  LEFT JOIN ecov ON itokp.doc_id = ecov.doc_id AND itokp.j = ecov.j
  WHERE ecov.doc_id IS NULL AND itokp.doc_id % {eval_mod} <> 0),
dstripped AS (
  SELECT d.doc_id,
         'dstrip:' || substr(md5(COALESCE(
            string_agg(ekept.tok, ' ' ORDER BY ekept.j), '')), 1, 16)
           AS metric,
         CAST(COUNT(ekept.tok) AS BIGINT) AS n
  FROM documents d LEFT JOIN ekept ON d.doc_id = ekept.doc_id
  WHERE d.doc_id % {eval_mod} <> 0
  GROUP BY d.doc_id)
SELECT * FROM overlap UNION ALL SELECT * FROM dup
UNION ALL SELECT * FROM stripped
UNION ALL SELECT * FROM dstripped
ORDER BY metric, doc_id"""


def sql_doc_corpus_cleans() -> str:
    """Mirror of queries.doc_corpus_cleans: tagged union of the exact
    clean (sql_doc_corpus_clean) and near-dup clean
    (sql_doc_corpus_near_clean) mirrors."""
    return f"""
WITH exact AS ({sql_doc_corpus_clean()}),
     near AS ({sql_doc_corpus_near_clean()}),
     reps AS ({sql_doc_repetition()})
SELECT doc_id, 'exact' AS metric, CAST(n_tokens AS BIGINT) AS n FROM exact
UNION ALL
SELECT doc_id, 'near' AS metric, CAST(cluster_size AS BIGINT) AS n FROM near
UNION ALL
SELECT d.doc_id, 'gopher',
       CAST(length(regexp_extract_all(d.text,
            '[^ \\t\\n\\r\\f\\v]+')) AS BIGINT)
FROM documents d JOIN reps r ON d.doc_id = r.doc_id
WHERE r.top_token_frac <= 0.10 AND r.dup_bigram_frac <= 0.05
  AND r.dup_5gram_frac <= 0.05
ORDER BY metric, doc_id"""


def sql_doc_pack(seq_len: int = 512) -> str:
    """Mirror of stages.pack.pack_sequences: token counts on the
    explicit ASCII whitespace class, exclusive prefix sum in doc_id
    order, concat-and-chunk sequence ids."""
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(text,
              '[ \\t\\n\\r\\f\\v]+'), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS token_offset
  FROM t)
SELECT doc_id, n_tokens, token_offset,
       CAST(token_offset // {seq_len} AS BIGINT) AS seq_id,
       CAST((token_offset + greatest(n_tokens - 1, 0)) // {seq_len}
         AS BIGINT) AS seq_id_last
FROM c ORDER BY doc_id"""


def sql_doc_repetition() -> str:
    """Gopher-style token-stream repetition fractions (mirror of
    stages/textops.py RepetitionStats): every fraction is an
    exact-int division performed in the same order as the numpy side
    (divide, then subtract), so the doubles are bit-identical."""
    return f"""
WITH toks AS (
  SELECT doc_id, w FROM (SELECT doc_id, {_TOK_SQL} AS w FROM documents)
  WHERE array_length(w) >= 1
),
tok AS (SELECT doc_id, unnest(w) AS t FROM toks),
tokc AS (
  SELECT doc_id, MAX(c)::DOUBLE / SUM(c)::DOUBLE AS top_token_frac
  FROM (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t)
  GROUP BY doc_id),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, array_length(w)),
                                       i -> w[i] || ' ' || w[i + 1])) AS g
  FROM toks WHERE array_length(w) >= 2),
bgc AS (
  SELECT doc_id, MAX(c)::DOUBLE / SUM(c)::DOUBLE AS top_bigram_frac,
         1.0 - (COUNT(*)::DOUBLE / SUM(c)::DOUBLE) AS dup_bigram_frac
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g)
  GROUP BY doc_id),
lg AS (
  SELECT doc_id, unnest(list_transform(range(1, array_length(w) - 3),
         i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] || ' '
              || w[i + 3] || ' ' || w[i + 4])) AS g
  FROM toks WHERE array_length(w) >= 5),
lgc AS (
  SELECT doc_id, 1.0 - (COUNT(*)::DOUBLE / SUM(c)::DOUBLE) AS dup_5gram_frac
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM lg GROUP BY doc_id, g)
  GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(tokc.top_token_frac, 0.0) AS top_token_frac,
       COALESCE(bgc.top_bigram_frac, 0.0) AS top_bigram_frac,
       COALESCE(bgc.dup_bigram_frac, 0.0) AS dup_bigram_frac,
       COALESCE(lgc.dup_5gram_frac, 0.0) AS dup_5gram_frac
FROM documents d
LEFT JOIN tokc USING (doc_id)
LEFT JOIN bgc USING (doc_id)
LEFT JOIN lgc USING (doc_id)
ORDER BY d.doc_id"""


def _sql_bpe_ctes(num_merges: int = 4) -> tuple:
    """Unrolled BPE merge iterations as DuckDB CTEs (mirrors
    stages/bpe.bpe_train; the kmeans-style unrolled-iteration oracle
    pattern).  Words are symbol STRINGS — base chars plus one
    private-use sentinel chr(57344+k) per merge — so DuckDB
    ``replace()`` IS the greedy left-to-right BPE merge step,
    byte-identical to the Ray side's str.replace.  Tie-break matches
    bpe_train: n desc, EXPANDED left asc, expanded right asc, raw
    pair asc (expansion = chain of sentinel->expansion replaces; a
    symbol is one char, so replace order is immaterial).  Returns
    (ctes_sql, union_legs_sql)."""
    chars = ("unnest(regexp_extract_all(word, '.')) AS ch, "
             "generate_subscripts(regexp_extract_all(word, '.'), 1) AS i")
    ctes = ["""
bwf AS (SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM itoks GROUP BY tok)""",
            "\nbw0 AS (SELECT word, freq FROM bwf)"]
    legs = []
    for k in range(1, num_merges + 1):
        def expand(col, upto=k):
            e = col
            for j in range(1, upto):
                e = (f"replace({e}, chr({57343 + j}), "
                     f"(SELECT e1 || e2 FROM bm{j}))")
            return e

        ctes.append(f"""
bc{k} AS (SELECT word, freq, {chars} FROM bw{k - 1}),
bp{k} AS (SELECT a.ch AS w1, b.ch AS w2,
                 CAST(SUM(a.freq) AS BIGINT) AS n
          FROM bc{k} a JOIN bc{k} b
            ON a.word = b.word AND b.i = a.i + 1
          GROUP BY a.ch, b.ch),
bm{k} AS (SELECT w1, w2, n, {expand('w1')} AS e1, {expand('w2')} AS e2
          FROM bp{k}
          ORDER BY n DESC, {expand('w1')}, {expand('w2')}, w1, w2
          LIMIT 1),
bw{k} AS (SELECT replace(word,
                         COALESCE((SELECT w1 || w2 FROM bm{k}), chr(1)),
                         chr({57343 + k})) AS word, freq
          FROM bw{k - 1})""")
        legs.append(f"""
UNION ALL SELECT CAST(-1 AS BIGINT),
  'bpe{k}:' || e1 || chr(31) || e2, n FROM bm{k}""")
    # tokenizer application: chain the trained merges over the raw
    # text (symbols never contain whitespace, so whole-text replace
    # == per-word replace) and count the surviving non-ws chars
    enc = "text"
    for k in range(1, num_merges + 1):
        enc = (f"replace({enc}, COALESCE((SELECT w1 || w2 FROM bm{k}),"
               f" chr(1)), chr({57343 + k}))")
    legs.append(f"""
UNION ALL SELECT doc_id, 'n_bpe{num_merges}_tokens',
  CAST(length(regexp_replace({enc}, '[ \\t\\n\\r\\f\\v]', '', 'g'))
       AS BIGINT)
FROM documents""")
    return ",".join(ctes), "".join(legs)


def _bm25_terms_sql() -> str:
    from .queries import BM25_DEMO_QUERY
    return "[" + ", ".join(_sql_str(t) for t in BM25_DEMO_QUERY) + "]"


def sql_doc_token_stats(vocab_top_m: int = 100) -> str:
    """Tagged-union mirror of queries.doc_token_stats (token counts
    melted + distinct-bigram counts + OOV counts against the corpus's
    own top-M vocab + bigram-LM avg logp + DSIR target/source
    logratio, one driver slot).  Vocab tie-break: count desc, token
    asc — the same deterministic ordering as stages/textops.
    corpus_vocab.  The lm/tlm CTEs re-train the add-alpha bigram
    models (source = whole corpus, target = doc_id % 5 = 0) exactly
    as corpus_bigram_lm does, min_count-pruned via HAVING.  The bpe
    legs re-run 4 unrolled BPE merge iterations (_sql_bpe_ctes).
    The quality_prob_e6 leg re-trains the logistic-regression quality
    classifier (sql_doc_quality_classifier: 20 GD iterations unrolled
    as MATERIALIZED CTEs) and carries the per-doc scores.  The bloom
    legs rebuild the distinct-token Bloom filter from the same two
    16-bit md5 lanes (256 chunk popcounts + vocab / '~absent~' probe
    memberships — even false positives are lane-exact)."""
    bpe_ctes, bpe_legs = _sql_bpe_ctes(4)
    return f"""
WITH tc AS ({sql_doc_token_counts()}), ng AS ({sql_doc_ngram_stats()}),
itoks AS (
  SELECT doc_id, unnest({_TOK_SQL}) AS tok,
         generate_subscripts({_TOK_SQL}, 1) AS i
  FROM documents),
vocab AS (
  SELECT tok, COUNT(*) AS n FROM itoks GROUP BY tok
  ORDER BY n DESC, tok LIMIT {vocab_top_m}),
oov AS (
  SELECT doc_id, COUNT(*) AS n FROM itoks
  WHERE tok NOT IN (SELECT tok FROM vocab) GROUP BY doc_id),
big AS (
  SELECT a.doc_id, a.tok AS w1, b.tok AS w2
  FROM itoks a JOIN itoks b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
uni AS (SELECT tok AS w1, COUNT(*) AS n FROM itoks GROUP BY tok),
bi AS (
  SELECT w1, w2, COUNT(*) AS n FROM big GROUP BY w1, w2
  HAVING COUNT(*) >= 2),
v AS (SELECT COUNT(*) AS nv FROM uni),
lm AS (
  SELECT big.doc_id, COUNT(*) AS n_lm,
         AVG(LN((COALESCE(bi.n, 0) + 0.5) / (uni.n + 0.5 * v.nv)))
           AS avg_logp
  FROM big LEFT JOIN bi ON big.w1 = bi.w1 AND big.w2 = bi.w2
  JOIN uni ON big.w1 = uni.w1 CROSS JOIN v GROUP BY big.doc_id),
tuni AS (
  SELECT tok AS w1, COUNT(*) AS n FROM itoks
  WHERE doc_id % 5 = 0 GROUP BY tok),
tbi AS (
  SELECT w1, w2, COUNT(*) AS n FROM big WHERE doc_id % 5 = 0
  GROUP BY w1, w2 HAVING COUNT(*) >= 2),
tv AS (SELECT COUNT(*) AS nv FROM tuni),
dsir AS (
  SELECT big.doc_id,
         AVG(LN((COALESCE(tbi.n, 0) + 0.5)
                / (COALESCE(tuni.n, 0) + 0.5 * GREATEST(tv.nv, 1)))
             - LN((COALESCE(bi.n, 0) + 0.5) / (uni.n + 0.5 * v.nv)))
           AS avg_lr
  FROM big
  LEFT JOIN tbi ON big.w1 = tbi.w1 AND big.w2 = tbi.w2
  LEFT JOIN tuni ON big.w1 = tuni.w1
  LEFT JOIN bi ON big.w1 = bi.w1 AND big.w2 = bi.w2
  JOIN uni ON big.w1 = uni.w1
  CROSS JOIN tv CROSS JOIN v GROUP BY big.doc_id),
tfidf_tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM itoks
             GROUP BY doc_id, tok),
tfidf_df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM itoks
             GROUP BY tok),
tfidf_nd AS (SELECT COUNT(*) AS n FROM documents),
tfidf_s AS (
  SELECT f.doc_id, f.tok,
         f.tf * CAST(ROUND(LN(CAST(nd.n AS DOUBLE) / d.df) * 1e6)
                     AS BIGINT) AS s
  FROM tfidf_tf f JOIN tfidf_df d USING (tok) CROSS JOIN tfidf_nd nd),
tfidf_r AS (
  SELECT doc_id, tok, s,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY s DESC, tok) AS rk
  FROM tfidf_s),
hll_h AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT)
         AS h FROM itoks),
hll_br AS (
  SELECT h // 72057594037927936 AS b,
         CASE WHEN h % 72057594037927936 = 0 THEN 57
              ELSE 57 - length(bin(h % 72057594037927936)) END AS rho
  FROM hll_h),
hll_regs AS MATERIALIZED (
  SELECT CAST(t.j AS BIGINT) AS j, COALESCE(mx, 0) AS r
  FROM range(256) t(j)
  LEFT JOIN (SELECT CAST(b AS BIGINT) AS b, MAX(rho) AS mx
             FROM hll_br GROUP BY b) q ON q.b = t.j),
hll_mm AS (SELECT MAX(r) AS mmax FROM hll_regs),
hll_den AS (
  SELECT SUM(CAST(1 AS HUGEINT) << (mmax - r)) AS d
  FROM hll_regs CROSS JOIN hll_mm),
hll_vz AS (SELECT COUNT(*) AS v FROM hll_regs WHERE r = 0),
cms_cells AS MATERIALIZED (
  SELECT r, ((CAST(('0x' || substr(md5(u.w1), 1, 16)) AS UBIGINT)
              >> (16 * r)) & 65535) % 1024 AS cell,
         SUM(u.n) AS cn
  FROM uni u CROSS JOIN range(4) t(r) GROUP BY 1, 2),
cms_est AS (
  SELECT v.tok, MIN(c.cn) AS est
  FROM vocab v JOIN cms_cells c
    ON c.cell = ((CAST(('0x' || substr(md5(v.tok), 1, 16)) AS UBIGINT)
                  >> (16 * c.r)) & 65535) % 1024
  GROUP BY v.tok),
bloom_h AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT)
         AS h FROM itoks),
bloom_bits AS MATERIALIZED (
  SELECT DISTINCT CAST((h >> (16 * r)) & 65535 AS BIGINT) AS j
  FROM bloom_h CROSS JOIN range(2) t(r)),
bloom_chunks AS (
  SELECT CAST(t.c AS BIGINT) AS c, COALESCE(q.n, 0) AS n
  FROM range(256) t(c)
  LEFT JOIN (SELECT j // 256 AS c, COUNT(*) AS n FROM bloom_bits
             GROUP BY 1) q ON q.c = t.c),
bloom_probes AS (
  SELECT tok, kind,
         CAST(('0x' || substr(md5(CASE WHEN kind = 1 THEN tok
                                   ELSE tok || '~absent~' END),
                              1, 16)) AS UBIGINT) AS h
  FROM vocab CROSS JOIN (SELECT unnest([1, 0]) AS kind)),
bloom_q AS (
  SELECT p.tok, p.kind,
         CASE WHEN b0.j IS NOT NULL AND b1.j IS NOT NULL
              THEN 1 ELSE 0 END AS present
  FROM bloom_probes p
  LEFT JOIN bloom_bits b0 ON b0.j = CAST(p.h & 65535 AS BIGINT)
  LEFT JOIN bloom_bits b1
    ON b1.j = CAST((p.h >> 16) & 65535 AS BIGINT)),
bm_qt AS (SELECT unnest({_bm25_terms_sql()}) AS term),
bm_stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         (SELECT COUNT(*) FROM itoks) AS n_tokens),
bm_df AS (
  SELECT term, (SELECT COUNT(DISTINCT doc_id) FROM itoks
                WHERE tok = term) AS df FROM bm_qt),
bm_idf AS (
  SELECT term, CAST(ROUND(LN((s.n_docs - df + 0.5) / (df + 0.5) + 1.0)
                          * 1e6) AS BIGINT) AS idf_e6
  FROM bm_df CROSS JOIN bm_stats s),
bm_dl AS (SELECT doc_id, COUNT(*) AS dl FROM itoks GROUP BY doc_id),
bm_tf AS (
  SELECT doc_id, tok AS term, COUNT(*) AS tf FROM itoks
  WHERE tok IN (SELECT term FROM bm_qt) GROUP BY doc_id, tok),
bm_terms AS (
  SELECT f.doc_id,
         CAST(ROUND(i.idf_e6 * ((f.tf * 2.2) / (f.tf + 1.2 * (0.25
              + 0.75 * (d.dl / (CAST(s.n_tokens AS DOUBLE)
                                / s.n_docs)))))) AS BIGINT) AS t_e6
  FROM bm_tf f JOIN bm_idf i USING (term) JOIN bm_dl d USING (doc_id)
  CROSS JOIN bm_stats s),
bm_sc AS (
  SELECT doc_id, SUM(t_e6) AS score_e6 FROM bm_terms GROUP BY doc_id
  HAVING SUM(t_e6) > 0),
bm_rank AS (
  SELECT ROW_NUMBER() OVER (ORDER BY score_e6 DESC, doc_id) AS rk,
         doc_id, score_e6
  FROM bm_sc),{bpe_ctes}
SELECT doc_id, 'n_chars' AS metric, n_chars AS n FROM tc
UNION ALL SELECT doc_id, 'n_tokens', n_tokens FROM tc
UNION ALL SELECT doc_id, 'n_bpe_tokens', n_bpe_tokens FROM tc
UNION ALL SELECT doc_id, 'n_distinct_bigrams', n_distinct_bigrams FROM ng
UNION ALL SELECT d.doc_id, 'n_oov', COALESCE(oov.n, 0)
FROM documents d LEFT JOIN oov USING (doc_id)
UNION ALL SELECT CAST(-1 AS BIGINT), 'vocab:' || tok, n FROM vocab
UNION ALL SELECT doc_id, 'n_lm_bigrams', n_lm FROM lm
UNION ALL SELECT doc_id, 'lm_avg_logp_e6',
  CAST(ROUND(avg_logp * 1e6) AS BIGINT) FROM lm
UNION ALL SELECT doc_id, 'dsir_logratio_e6',
  CAST(ROUND(avg_lr * 1e6) AS BIGINT) FROM dsir{bpe_legs}
UNION ALL SELECT doc_id, 'ccnet_bucket', (r * 3) // ntot FROM (
  SELECT doc_id,
         ROW_NUMBER() OVER (
           ORDER BY CAST(ROUND(avg_logp * 1e6) AS BIGINT), doc_id)
           - 1 AS r,
         COUNT(*) OVER () AS ntot
  FROM lm)
UNION ALL SELECT doc_id, 'quality_prob_e6', quality_prob_e6
FROM ({sql_doc_quality_classifier()})
UNION ALL SELECT doc_id, 'tfidf' || rk || ':' || tok, s
FROM tfidf_r WHERE rk <= 3
UNION ALL SELECT CAST(-1 AS BIGINT), 'hll_reg:' || lpad(CAST(j AS VARCHAR), 3, '0'), r
FROM hll_regs
UNION ALL SELECT CAST(-1 AS BIGINT), 'hll_est_raw_e6',
  CAST(ROUND((0.7213 / (1.0 + 1.079 / 256)) * 256 * 256
             * power(2.0, (SELECT mmax FROM hll_mm))
             / CAST((SELECT d FROM hll_den) AS DOUBLE) * 1e6) AS BIGINT)
UNION ALL SELECT CAST(-1 AS BIGINT), 'hll_est_lin_e6',
  CASE WHEN (SELECT v FROM hll_vz) = 0 THEN CAST(-1 AS BIGINT)
       ELSE CAST(ROUND(256 * ln(256.0 / (SELECT v FROM hll_vz)) * 1e6)
                 AS BIGINT) END
UNION ALL SELECT doc_id, 'bm25_r' || rk, CAST(score_e6 AS BIGINT)
FROM bm_rank WHERE rk <= 10
UNION ALL SELECT CAST(-1 AS BIGINT), 'cms:' || tok, CAST(est AS BIGINT)
FROM cms_est
UNION ALL SELECT CAST(-1 AS BIGINT),
  'bloom_chunk:' || lpad(CAST(c AS VARCHAR), 3, '0'), n
FROM bloom_chunks
UNION ALL SELECT CAST(-1 AS BIGINT), 'bloom_q' || kind || ':' || tok,
  CAST(present AS BIGINT)
FROM bloom_q{_quantile_legs_sql()}"""


def _quantile_legs_sql() -> str:
    """r5: exact-quantile legs over the per-doc token counts — the
    explicit rank-ceil(q*n) order statistic (same contract as
    stages/textops.exact_quantiles; no interpolation ambiguity)."""
    from ..stages.textops import QUANTILE_QS

    legs = []
    for q in QUANTILE_QS:
        legs.append(
            f"\nUNION ALL SELECT CAST(-1 AS BIGINT), "
            f"'q{int(round(q * 100))}:n_tokens', v FROM ("
            f"SELECT n_tokens AS v, ROW_NUMBER() OVER (ORDER BY n_tokens)"
            f" AS rn, COUNT(*) OVER () AS nn FROM tc) "
            f"WHERE rn = GREATEST(1, CAST(CEIL({q} * nn) AS BIGINT))")
    return "".join(legs)


def sql_doc_dedups() -> str:
    """Tagged-union mirror of queries.doc_dedups: whole-corpus exact
    dedup + normalized-text ("fuzzy-exact") dedup + the incremental
    (new-split vs store-split) anti-join."""
    return """
WITH full_d AS (
  SELECT text, MIN(doc_id) AS doc_id FROM documents GROUP BY text),
norm_d AS (
  SELECT n_text AS text, MIN(doc_id) AS doc_id FROM (
    SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS n_text
    FROM documents) GROUP BY n_text),
store AS (SELECT text FROM documents WHERE doc_id % 5 <> 0),
new_d AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
incr AS (
  SELECT text, MIN(doc_id) AS doc_id FROM new_d
  WHERE text NOT IN (SELECT text FROM store) GROUP BY text)
SELECT doc_id, 'full' AS metric, text FROM full_d
UNION ALL SELECT doc_id, 'norm' AS metric, text FROM norm_d
UNION ALL SELECT doc_id, 'incr' AS metric, text FROM incr"""


def sql_embedding_kmeans(k: int = 8, n_iter: int = 4, dim: int = 64) -> str:
    """DuckDB mirror of stages/similarity.kmeans_embeddings — the
    Lloyd iterations UNROLLED as CTE pairs (assign by ``ORDER BY
    |c|^2 - 2 x·c, cid`` — the SAME expanded expression the numpy
    side argmins, NOT the sqrt ``list_distance`` form, so the two
    engines evaluate one functional form and can only diverge on
    summation-order ulps at an exact near-tie, ADVICE r4 — update by
    per-position ``ROUND(AVG(..), 6)``).  The 6-decimal rounding
    after every update is the shared determinism contract: both
    engines land on the same decimal despite different summation
    orders, so an ITERATIVE algorithm hash-matches exactly.  Residual
    contract (same spirit as the ROUND note): points whose two
    nearest centroids tie within ~1 ulp of the dot products may
    assign differently per engine; no such tie exists in the test
    corpora, and the 6-decimal centroid rounding re-synchronizes the
    next iteration regardless."""
    parts = [f"""
base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
              CAST(embedding AS DOUBLE[]) AS c
       FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {k}))"""]
    for t in range(1, n_iter + 1):
        parts.append(f"""
a{t} AS (SELECT vec_id, e, cid FROM (
    SELECT x.vec_id, x.e, c.cid,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id
                              ORDER BY list_inner_product(c.c, c.c)
                                     - 2 * list_inner_product(x.e, c.c),
                                       c.cid) AS rn
    FROM base x CROSS JOIN c{t - 1} c) WHERE rn = 1),
u{t} AS (SELECT cid, list(v ORDER BY i) AS c FROM (
    SELECT a.cid, r.i, ROUND(AVG(a.e[r.i]), 6) AS v
    FROM a{t} a, range(1, {dim + 1}) r(i)
    GROUP BY a.cid, r.i) GROUP BY cid),
c{t} AS (SELECT p.cid, COALESCE(u.c, p.c) AS c
         FROM c{t - 1} p LEFT JOIN u{t} u USING (cid))""")
    final = f"""
SELECT x.vec_id, cid AS cluster FROM (
    SELECT x.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id
                              ORDER BY list_inner_product(c.c, c.c)
                                     - 2 * list_inner_product(x.e, c.c),
                                       c.cid) AS rn
    FROM base x CROSS JOIN c{n_iter} c) x WHERE rn = 1"""
    return "WITH " + ",".join(parts) + final


def sql_embedding_clusters(threshold: float = 0.45) -> str:
    """Tagged-union mirror of queries.embedding_clusters: cosine-pair
    connected components + iterative k-means + the SemDeDup
    composition (within-kmeans-bucket cosine pairs closed with the
    same recursive transitive closure, representative = min id;
    singletons keep their own id), one driver slot."""
    return f"""
WITH RECURSIVE cc AS ({sql_embedding_dedup_clusters()}),
km AS ({sql_embedding_kmeans()}),
sd_pairs AS (
  SELECT ka.vec_id AS id_a, kb.vec_id AS id_b
  FROM km ka JOIN km kb
    ON ka.cluster = kb.cluster AND ka.vec_id < kb.vec_id
  JOIN embeddings ea ON ea.vec_id = ka.vec_id
  JOIN embeddings eb ON eb.vec_id = kb.vec_id
  WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                               CAST(eb.embedding AS DOUBLE[]))
        >= {threshold}),
sd_sym(a, b) AS (
  SELECT id_a, id_b FROM sd_pairs
  UNION SELECT id_b, id_a FROM sd_pairs),
sd_reach(a, b) AS (
  SELECT a, b FROM sd_sym
  UNION
  SELECT r.a, s.b FROM sd_reach r JOIN sd_sym s ON r.b = s.a),
sd_labels AS (
  SELECT a AS node, least(a, min(b)) AS label FROM sd_reach GROUP BY a)
SELECT CAST(vec_id AS BIGINT) AS vec_id, 'cc' AS method,
       CAST(cluster AS BIGINT) AS cluster FROM cc
UNION ALL
SELECT CAST(vec_id AS BIGINT), 'kmeans', CAST(cluster AS BIGINT) FROM km
UNION ALL
SELECT CAST(e.vec_id AS BIGINT), 'semdedup',
       CAST(COALESCE(l.label, e.vec_id) AS BIGINT)
FROM embeddings e LEFT JOIN sd_labels l ON e.vec_id = l.node"""


def sql_doc_samples(topn: int = 25) -> str:
    """Tagged-union mirror of queries.doc_samples: the rate-gated
    stratified sample + the fixed-budget per-stratum top-N (smallest
    md5-keyed hash, doc_id tiebreak — same ORDER BY as the Ray side's
    grouped_topk order_cols)."""
    h = _MD5_LOW64.format(expr="CAST(doc_id AS VARCHAR)")
    return f"""
WITH rate AS ({sql_doc_sample_stratified()}),
langs AS ({sql_doc_langid()}),
ranked AS (
  SELECT doc_id, pred_lang,
         ROW_NUMBER() OVER (PARTITION BY pred_lang
                            ORDER BY ({h} >> 1), doc_id) AS rn
  FROM langs),
splits AS (
  SELECT doc_id,
         CASE WHEN u < 80 THEN 'train'
              WHEN u < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT doc_id, ({h} >> 1) % 100 AS u FROM documents))
SELECT doc_id, 'rate' AS metric, pred_lang FROM rate
UNION ALL
SELECT doc_id, 'topn' AS metric, pred_lang FROM ranked
WHERE rn <= {topn}
UNION ALL
SELECT doc_id, 'split' AS metric, split AS pred_lang FROM splits"""


def sql_sessionizes(gap_minutes: int = 30) -> str:
    """Tagged-union mirror of queries.sessionizes: the events-plane
    sessionizer (sql_events_sessionize unchanged, as a CTE) + the
    transcripts-plane conversation sessionizer — same window/gap
    semantics partitioned by conv_id, ordered by (ts, turn_idx)."""
    return f"""
WITH {transcripts_cte()},
ev AS ({sql_events_sessionize(gap_minutes)}),
co AS (
  SELECT conv_id, turn_idx, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL {gap_minutes} MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
), cs AS (
  SELECT conv_id, ts,
         SUM(new_sess) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM co
), cv AS (
  SELECT conv_id, CAST(session_id AS BIGINT) AS session_id,
         COUNT(*) AS n, MIN(ts) AS start_ts, MAX(ts) AS end_ts
  FROM cs GROUP BY conv_id, session_id
)
SELECT 'events' AS plane, CAST(user_id AS VARCHAR) AS key,
       session_id, n_events AS n, start_ts, end_ts FROM ev
UNION ALL
SELECT 'conv', conv_id, session_id, n, start_ts, end_ts FROM cv"""


def sql_grouped_topks(k: int = 3) -> str:
    """Tagged-union mirror of queries.grouped_topks: the events-plane
    grouped top-k + the KG-plane top mentions per conversation, both
    unchanged as CTEs; the events leg carries epoch_us(ts) in ``n``
    so every column is non-null on both engines."""
    return f"""
WITH ev AS ({sql_events_topk_per_user(k)}),
kg AS ({sql_kg_top_mentions_per_conversation(k)})
SELECT 'events' AS plane, CAST(user_id AS VARCHAR) AS key,
       CAST(event_id AS VARCHAR) AS item,
       CAST(epoch_us(ts) AS BIGINT) AS n FROM ev
UNION ALL
SELECT 'kg', conv_uri, entity, n_mentions FROM kg"""


def sql_kg_continuous_ingest() -> str:
    """Mirror of queries.kg_continuous_ingest.  update_kg's contract
    is exact (store(half) ∪ added == full-corpus build, disjointly),
    so the mirror needs no half-split at all: leg 1 is the full-corpus
    canonicalized triple set (same min-per-normalized-label closure as
    sql_kg_triples_canonicalized), leg 2 its type counts as
    pseudo-triples, leg 3 the merged pre-dedup row count — which
    equals COUNT(triples) exactly when the anti-join added neither
    duplicates nor omissions."""
    pl = _sql_str(PREF_LABEL)
    t = _sql_str(RDF_TYPE)
    return (kg_triples_cte() + f""",
labels AS (
  SELECT DISTINCT subject AS entity,
         trim(regexp_replace(lower(object), '[^a-z0-9]+', ' ', 'g')) AS norm
  FROM triples WHERE predicate = {pl}),
canon AS (
  SELECT entity, min(entity) OVER (PARTITION BY norm) AS canonical
  FROM labels),
canon_triples AS (
  SELECT DISTINCT coalesce(cs.canonical, tr.subject) AS subject,
         tr.predicate,
         CASE WHEN tr.object_kind = 'uri'
              THEN coalesce(co.canonical, tr.object) ELSE tr.object
         END AS object,
         tr.object_kind, tr.lang, tr.datatype
  FROM triples tr
  LEFT JOIN canon cs ON cs.entity = tr.subject
  LEFT JOIN canon co ON co.entity = tr.object AND tr.object_kind = 'uri')
SELECT * FROM canon_triples
UNION ALL
SELECT object AS subject, 'urn:graft:stat:n' AS predicate,
       CAST(COUNT(*) AS VARCHAR) AS object, 'stat' AS object_kind,
       '' AS lang, '' AS datatype
FROM canon_triples WHERE predicate = {t} GROUP BY object
UNION ALL
SELECT 'urn:graft:metric:merged_rows', 'urn:graft:stat:n',
       CAST((SELECT COUNT(*) FROM triples) AS VARCHAR), 'stat', '', ''""")


def sql_doc_quality_classifier(dim: int = 64, n_iter: int = 20,
                               lr: float = 0.5,
                               feat_mode: str = "binary") -> str:
    """DuckDB mirror of queries.doc_quality_classifier — full-batch
    logistic regression UNROLLED as CTE pairs (the kmeans precedent,
    sql_embedding_kmeans): features are the sparse (doc_id, bucket,
    v = count/len) relation over md5-low64 % dim token buckets plus a
    bias row (bucket = dim, v = 1.0) for EVERY doc (so zero-token
    docs still score sigmoid(w_bias)); each iteration computes
    logits by a feature/weight join, the mean gradient by a
    feature/error join, and re-synchronizes on the shared ROUND(w, 6)
    grid exactly like the Ray side's np.round(w, 6).  Final
    probabilities are CAST(ROUND(1e6 * sigmoid(z)) AS BIGINT) — the
    e6-integer parity contract (a prob within a summation-order ulp
    of a half-microunit boundary could round apart; measure-zero, the
    dsir/lm caveat)."""
    v_expr = ("1.0" if feat_mode == "binary"
              else "CAST(c.c AS DOUBLE) / t.n_tok")
    parts = [f"""
cdocs AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CASE WHEN regexp_matches(text, '\\bdata\\b')
              THEN 1.0 ELSE 0.0 END AS y
  FROM documents),
ctok AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         unnest(list_filter(
             string_split_regex(text, '[ \\t\\n\\r\\f\\v]+'),
             t -> t <> '')) AS tok
  FROM documents),
cfeat AS MATERIALIZED (
  SELECT c.doc_id, c.bucket, {v_expr} AS v
  FROM (SELECT doc_id,
               CAST(CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT)
                    % {dim} AS BIGINT) AS bucket,
               COUNT(*) AS c
        FROM ctok GROUP BY 1, 2) c
  JOIN (SELECT doc_id, COUNT(*) AS n_tok FROM ctok GROUP BY 1) t
    USING (doc_id)
  UNION ALL
  SELECT doc_id, {dim} AS bucket, 1.0 AS v FROM cdocs),
cn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM cdocs),
cw0 AS (SELECT CAST(r.range AS BIGINT) AS bucket, 0.0 AS w
        FROM range({dim + 1}) r)"""]
    for t in range(1, n_iter + 1):
        parts.append(f"""
cz{t} AS MATERIALIZED (SELECT f.doc_id, SUM(f.v * w.w) AS z
          FROM cfeat f JOIN cw{t - 1} w USING (bucket) GROUP BY 1),
cg{t} AS MATERIALIZED (SELECT f.bucket,
                 SUM((1.0 / (1.0 + exp(-z.z)) - d.y) * f.v) AS g
          FROM cfeat f
          JOIN cz{t} z USING (doc_id)
          JOIN cdocs d ON d.doc_id = f.doc_id
          GROUP BY 1),
cw{t} AS MATERIALIZED (SELECT w.bucket,
                 ROUND(w.w - {lr} * COALESCE(g.g, 0.0)
                       / (SELECT n FROM cn), 6) AS w
          FROM cw{t - 1} w LEFT JOIN cg{t} g USING (bucket))""")
    final = f"""
SELECT d.doc_id,
       CAST(ROUND(1e6 * (1.0 / (1.0 + exp(-z.z)))) AS BIGINT)
           AS quality_prob_e6
FROM cdocs d
JOIN (SELECT f.doc_id, SUM(f.v * w.w) AS z
      FROM cfeat f JOIN cw{n_iter} w USING (bucket)
      GROUP BY 1) z USING (doc_id)"""
    return "WITH " + ",".join(parts) + final
