"""Upper-ontology (gist) loader — reference templates.py:338-401.

The reference ships Semantic Arts' gist 14.1.0 (CC BY 4.0) as four
Turtle modules under ``samples/gist/`` and exposes a registry +
module loader the workbench uses to seed a store with an upper
ontology.  This re-authors the registry (same module surface) and
loads the modules through our own Turtle parser; the Turtle data files
themselves are third-party content and are read from a configurable
samples directory rather than vendored into this repo (default: the
reference checkout when present, else ``ORIONBELT_SAMPLES_DIR``).
"""

from __future__ import annotations

import os
from typing import List, Optional

_DEFAULT_SAMPLES = "/root/reference/samples"

# registry mirror of reference templates.py:337-381
UPPER_ONTOLOGIES = [
    {
        "name": "gist (Semantic Arts)",
        "version": "14.1.0",
        "description": (
            "A minimalist upper ontology for the enterprise by Semantic "
            "Arts. Covers ~100 foundational classes (Event, Person, "
            "Organization, Agreement, Specification, etc.) and ~100 "
            "properties. Licensed under CC BY 4.0."
        ),
        "url": "https://www.semanticarts.com/gist/",
        "license": "Creative Commons Attribution 4.0 International (CC BY 4.0)",
        "attribution": "Semantic Arts, Inc.",
        "modules": [
            {"name": "gistCore", "file": "gist/gistCore14.1.0.ttl",
             "description": "Main ontology with all classes, properties, "
                            "and restrictions",
             "required": True},
            {"name": "gistRdfsAnnotations",
             "file": "gist/gistRdfsAnnotations14.1.0.ttl",
             "description": "rdfs:label and rdfs:comment annotations for "
                            "compatibility",
             "required": False, "default": True},
            {"name": "gistSubClassAssertions",
             "file": "gist/gistSubClassAssertions14.1.0.ttl",
             "description": "Materialized subclass inferences (useful "
                            "without a DL reasoner)",
             "required": False, "default": True},
            {"name": "gistMediaTypes", "file": "gist/gistMediaTypes14.1.0.ttl",
             "description": "Common internet media type instances",
             "required": False, "default": False},
        ],
    },
]


def samples_dir() -> str:
    return os.environ.get("ORIONBELT_SAMPLES_DIR", _DEFAULT_SAMPLES)


def get_upper_ontology_names() -> List[str]:
    return [o["name"] for o in UPPER_ONTOLOGIES]


def get_upper_ontology(name: str) -> Optional[dict]:
    for o in UPPER_ONTOLOGIES:
        if o["name"] == name:
            return o
    return None


def load_upper_ontology_module(module: dict,
                               base_dir: Optional[str] = None) -> str:
    """Module Turtle content (reference load_upper_ontology_module)."""
    path = os.path.join(base_dir or samples_dir(), module["file"])
    with open(path, encoding="utf-8") as f:
        return f.read()


def default_modules(onto: dict) -> List[dict]:
    """Required modules plus optional ones flagged default=True."""
    return [m for m in onto["modules"]
            if m.get("required") or m.get("default")]


def load_upper_ontology(store, name: str,
                        modules: Optional[List[str]] = None,
                        base_dir: Optional[str] = None) -> int:
    """Merge the named upper ontology's modules into ``store``; returns
    the number of triples added.  ``modules`` selects by module name
    (None = required + default, the reference's preselection)."""
    from ..sources.turtle import extract_prefixes, parse_turtle

    onto = get_upper_ontology(name)
    if onto is None:
        raise ValueError(f"Unknown upper ontology: {name!r} "
                         f"(available: {get_upper_ontology_names()})")
    selected = (default_modules(onto) if modules is None else
                [m for m in onto["modules"] if m["name"] in set(modules)])
    required = {m["name"] for m in onto["modules"] if m.get("required")}
    chosen = {m["name"] for m in selected}
    if not required <= chosen:
        raise ValueError(f"Required modules missing: {required - chosen}")
    before = len(store.rows)
    for module in selected:
        text = load_upper_ontology_module(module, base_dir)
        store.rows.update(parse_turtle(text))
        store.loaded_prefixes.update(extract_prefixes(text))
    return len(store.rows) - before
