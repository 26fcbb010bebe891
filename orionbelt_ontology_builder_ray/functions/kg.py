"""KG vocabulary for the transcript-extraction pipeline.

The graft's extraction stage (SURVEY.md §0) maps transcript rows
``(conv_id, turn_idx, role, text, tool, ts)`` to the reference's
emission patterns: each turn/conversation/tool/mentioned-entity becomes
an ``add_individual`` (+ ``add_individual_property`` /
``add_annotation``) call over the KG namespace below
(ontology_manager.py:976-1002, 1199-1240).
"""

from __future__ import annotations

from .terms import OWL_NAMED_INDIVIDUAL, RDFS_LABEL, SKOS_PREF_LABEL

KG = "http://graft.local/kg#"

KG_TURN = KG + "Turn"
KG_CONVERSATION = KG + "Conversation"
KG_TOOL = KG + "Tool"
KG_PLACE = KG + "Place"
KG_REGION = KG + "Region"

KG_IN_CONVERSATION = KG + "inConversation"
KG_ROLE = KG + "role"
KG_TEXT = KG + "text"
KG_TURN_INDEX = KG + "turnIndex"
KG_USED_TOOL = KG + "usedTool"
KG_MENTIONS = KG + "mentions"
KG_AT_TIME = KG + "atTime"

NAMED_INDIVIDUAL = OWL_NAMED_INDIVIDUAL
LABEL = RDFS_LABEL
PREF_LABEL = SKOS_PREF_LABEL


def seed_schema_store():
    """The seed ontology for the extraction vocabulary, built through
    the schema-plane store (broadcast into stages; also unioned into
    the flagship output)."""
    from ..state.graph import TripleStore

    s = TripleStore(KG)
    s.add_class("Entity", label="Entity")
    s.add_class("Turn", label="Turn")
    s.add_class("Conversation", label="Conversation")
    s.add_class("Tool", parent="Entity", label="Tool")
    s.add_class("Place", parent="Entity", label="Place")
    s.add_class("Region", parent="Entity", label="Region")
    s.add_object_property("inConversation", "Turn", "Conversation",
                          label="in conversation")
    s.add_object_property("usedTool", "Turn", "Tool", label="used tool")
    s.add_object_property("mentions", "Turn", "Place", label="mentions")
    s.add_data_property("role", "Turn", "string", label="role")
    s.add_data_property("text", "Turn", "string", label="text")
    s.add_data_property("turnIndex", "Turn", "integer", label="turn index")
    s.add_data_property("atTime", "Turn", "dateTime", label="at time")
    return s
