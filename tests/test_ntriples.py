"""N-Triples serialize/parse round-trip; snapshot/undo."""

from orionbelt_ontology_builder_ray.functions.terms import Triple
from orionbelt_ontology_builder_ray.sources.ntriples import (
    format_row, parse_line, parse_rows, serialize_rows,
)
from orionbelt_ontology_builder_ray.state.undo import UndoManager

B = "http://test.org/ont#"


def test_format_uri_bnode_literal():
    assert format_row(Triple(B + "a", B + "p", B + "b", "uri", "", "")) == \
        f"<{B}a> <{B}p> <{B}b> ."
    assert format_row(Triple("_:x1", B + "p", "_:x2", "bnode", "", "")) == \
        f"_:x1 <{B}p> _:x2 ."
    assert format_row(Triple(B + "a", B + "p", "hi", "literal", "en", "")) == \
        f'<{B}a> <{B}p> "hi"@en .'
    assert format_row(Triple(B + "a", B + "p", "5", "literal", "",
                             "http://www.w3.org/2001/XMLSchema#integer")) == \
        f'<{B}a> <{B}p> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .'


def test_escaping_roundtrip():
    nasty = 'he said "hi"\nand\tleft\\now'
    row = Triple(B + "a", B + "p", nasty, "literal", "", "")
    assert parse_line(format_row(row)) == row


def test_store_roundtrip(populated):
    populated.add_annotation("Person", "label", "Person", lang="de")
    populated.add_restriction("Person", "worksFor", "minCardinality", 1)
    text = serialize_rows(populated.to_rows())
    back = set(parse_rows(text))
    assert back == populated.rows


def test_undo_redo(populated):
    mgr = UndoManager(populated)
    n0 = len(populated.rows)
    populated.add_class("Extra")
    mgr.checkpoint("add Extra")
    assert len(populated.rows) > n0
    assert mgr.undo() == "Initial state"
    assert len(populated.rows) == n0
    assert mgr.redo() == "add Extra"
    assert populated.has(B + "Extra",
                         "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                         "http://www.w3.org/2002/07/owl#Class")


def test_undo_cap_and_redo_clear(populated):
    mgr = UndoManager(populated, max_history=3)
    for i in range(5):
        populated.add_class(f"C{i}")
        mgr.checkpoint(f"add C{i}")
    assert len(mgr._undo_stack) == 3
    mgr.undo()
    assert mgr.can_redo()
    populated.add_class("Fresh")
    mgr.checkpoint("fresh")
    assert not mgr.can_redo()  # redo stack cleared on new checkpoint


def test_undo_redo_bottom_and_empty_return_none(populated):
    """Reference edge semantics (tests/test_undo.py): undo at the
    bottom of the stack and redo with nothing undone both return None
    and leave the store untouched."""
    mgr = UndoManager(populated)
    before = set(populated.rows)
    assert mgr.undo() is None
    assert populated.rows == before
    assert mgr.redo() is None
    assert populated.rows == before
    populated.add_class("Edge")
    mgr.checkpoint("edge")
    mgr.undo()
    assert mgr.undo() is None  # bottom again after one real undo
