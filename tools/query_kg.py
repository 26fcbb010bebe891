"""Ad-hoc SPARQL-style queries over a triples store from the CLI.

The user-facing face of stages/bgp.py — what the reference exposes as
its search/listing UI, generalized to arbitrary conjunctive queries:

    python tools/query_kg.py --store /out/triples \
        -p "?t kg:mentions ?e" -p "?e rdf:type kg:Place" \
        [--optional "?t kg:usedTool ?tool"] \
        [--filter "?a < ?b"] [--select ?t ?e] \
        [--construct "?e kg:mentionedIn ?t" --output /out/enriched] \
        [--group-count ?e] [--path kg:broader] [--limit 20]

Term syntax: ``?name`` is a variable; a CURIE with one of the built-in
prefixes (kg: rdf: rdfs: owl: skos: xsd:) or any absolute URI/literal
is a constant.  Owns its Ray session (standalone script).  SELECT
prints solutions as TSV (sorted variable columns); --construct writes
(or prints) the constructed triples; --group-count prints (value,
count) rows; --path prints the predicate's transitive-closure pairs.
"""

from __future__ import annotations

import argparse
import sys

PREFIXES = {
    "kg:": "http://graft.local/kg#",
    "rdf:": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs:": "http://www.w3.org/2000/01/rdf-schema#",
    "owl:": "http://www.w3.org/2002/07/owl#",
    "skos:": "http://www.w3.org/2004/02/skos/core#",
    "xsd:": "http://www.w3.org/2001/XMLSchema#",
}


def term(tok: str) -> str:
    if tok.startswith("?"):
        return tok
    for pfx, uri in PREFIXES.items():
        if tok.startswith(pfx):
            return uri + tok[len(pfx):]
    return tok


def pattern(spec: str):
    toks = spec.split()
    if len(toks) != 3:
        raise SystemExit(f"pattern must have 3 terms: {spec!r}")
    return tuple(term(t) for t in toks)


def filt(spec: str):
    toks = spec.split()
    if len(toks) != 3 or toks[1] not in ("<", "<=", ">", ">=", "=", "!="):
        raise SystemExit(f"filter must be '?a OP ?b-or-const': {spec!r}")
    return (toks[0], toks[1], term(toks[2]))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--store", required=True,
                    help="triples parquet dir (build_kg output)")
    ap.add_argument("-p", "--pattern", action="append", default=[],
                    help="required triple pattern '?s pred ?o' (repeat)")
    ap.add_argument("--optional", action="append", default=[],
                    help="OPTIONAL triple pattern (repeat)")
    ap.add_argument("--filter", action="append", default=[],
                    help="constraint '?a < ?b' (repeat)")
    ap.add_argument("--minus", action="append", default=[],
                    help="MINUS / NOT-EXISTS pattern (repeat)")
    ap.add_argument("--select", nargs="+", default=None,
                    help="projected variables (default: all bound)")
    ap.add_argument("--construct", default=None,
                    help="template triple; emit triples instead of rows")
    ap.add_argument("--group-count", default=None, metavar="?VAR",
                    help="GROUP BY ?VAR COUNT(*) instead of solutions")
    ap.add_argument("--path", default=None, metavar="PRED",
                    help="print PRED+ transitive-closure pairs instead")
    ap.add_argument("--ask", action="store_true",
                    help="print true/false: does the BGP have a solution")
    ap.add_argument("--describe", default=None, metavar="URI",
                    help="print every triple where URI is subject or "
                         "URI object, instead of a BGP query")
    ap.add_argument("--order-by", default=None, metavar="?VAR",
                    help="ORDER BY ?VAR with --limit as the k (top-k)")
    ap.add_argument("--desc", action="store_true",
                    help="descending --order-by")
    ap.add_argument("--repartition-store", default=None, metavar="OUT",
                    help="instead of querying, rewrite --store as a "
                         "pred_part=<key>/ hive layout at OUT (whole-"
                         "file pruning for constant-predicate scans)")
    ap.add_argument("--output", default=None,
                    help="write result parquet here instead of printing")
    ap.add_argument("--limit", type=int, default=100,
                    help="max rows to print (ignored with --output)")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import ray

    if not ray.is_initialized():
        # workers must also import the package when the CLI is run
        # from outside the repo directory
        kw = dict(address="local", include_dashboard=False,
                  logging_level="ERROR",
                  runtime_env={"env_vars": {"PYTHONPATH": repo}})
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from orionbelt_ontology_builder_ray.stages.bgp import (
        ask as bgp_ask, bgp_group_count, bgp_topk, construct_triples,
        describe as bgp_describe, match_bgp, property_path_closure,
        write_store_by_predicate)

    # pass the PATH, not a Dataset: each pattern scan then issues its
    # own pruned read (constant positions -> parquet filter, variable
    # positions -> column projection)
    ds = args.store
    if args.repartition_store:
        import ray.data as rd

        write_store_by_predicate(rd.read_parquet(args.store),
                                 args.repartition_store)
        print(f"wrote pred_part layout to {args.repartition_store}")
        ray.shutdown()
        return 0
    if args.ask:
        print("true" if bgp_ask(ds, [pattern(p) for p in args.pattern],
                                filters=[filt(f) for f in args.filter],
                                optional=[pattern(p)
                                          for p in args.optional],
                                minus=[pattern(p) for p in args.minus])
              else "false")
        ray.shutdown()
        return 0
    if args.describe:
        out = bgp_describe(ds, term(args.describe))
    elif args.path:
        out = property_path_closure(ds, term(args.path))
    elif args.construct:
        out = construct_triples(ds, [pattern(p) for p in args.pattern],
                                template=pattern(args.construct),
                                select=args.select,
                                filters=[filt(f) for f in args.filter],
                                optional=[pattern(p)
                                          for p in args.optional],
                                minus=[pattern(p) for p in args.minus])
    elif args.group_count:
        out = bgp_group_count(ds, "q", [pattern(p) for p in args.pattern],
                              by=args.group_count, select=args.select,
                              filters=[filt(f) for f in args.filter],
                              optional=[pattern(p)
                                        for p in args.optional],
                              minus=[pattern(p) for p in args.minus])
    else:
        if not args.pattern:
            raise SystemExit("at least one -p pattern required")
        kw = dict(select=args.select,
                  filters=[filt(f) for f in args.filter],
                  optional=[pattern(p) for p in args.optional],
                  minus=[pattern(p) for p in args.minus])
        if args.order_by:
            out = bgp_topk(ds, [pattern(p) for p in args.pattern],
                           order_by=args.order_by, k=args.limit,
                           descending=args.desc, **kw)
        else:
            out = match_bgp(ds, [pattern(p) for p in args.pattern], **kw)
    if args.output:
        out.write_parquet(args.output)
        print(f"wrote {out.count()} rows to {args.output}")
    else:
        rows = out.take(args.limit)
        if rows:
            cols = list(rows[0])
            print("\t".join(cols))
            for r in rows:
                print("\t".join("NULL" if r[c] is None else str(r[c])
                                for c in cols))
        print(f"-- {out.count()} rows total", file=sys.stderr)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
