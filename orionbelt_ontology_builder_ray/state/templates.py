"""Built-in starter ontologies (seed schemas for the extraction stage).

Reproduces the reference's 5 template vocabularies
(/root/reference/templates.py:5-315) as programmatic builders over
``TripleStore`` — the template classes/properties double as the mention
vocabulary for extraction tests (SURVEY.md §2.14).
"""

from __future__ import annotations

from typing import Callable, Dict, List

from .graph import TripleStore


def _organization(s: TripleStore) -> None:
    s.add_class("Organization", label="Organization")
    s.add_class("Department", parent="Organization", label="Department")
    s.add_class("Person", label="Person")
    s.add_class("Role", label="Role")
    s.add_object_property("worksFor", "Person", "Organization", label="works for")
    s.add_object_property("hasDepartment", "Organization", "Department",
                          label="has department")
    s.add_object_property("hasRole", "Person", "Role", label="has role")
    s.add_object_property("manages", "Person", "Department", label="manages")
    s.add_data_property("hasName", "Person", "string", label="has name")
    s.add_data_property("hasEmail", "Person", "string", label="has email")
    s.add_data_property("foundedYear", "Organization", "integer",
                        label="founded year")


def _product_catalog(s: TripleStore) -> None:
    s.add_class("Product", label="Product")
    s.add_class("Category", label="Category")
    s.add_class("Brand", label="Brand")
    s.add_class("Review", label="Review")
    s.add_object_property("belongsToCategory", "Product", "Category",
                          label="belongs to category")
    s.add_object_property("hasBrand", "Product", "Brand", label="has brand")
    s.add_object_property("hasReview", "Product", "Review", label="has review")
    s.add_object_property("hasSubCategory", "Category", "Category",
                          label="has sub-category")
    s.add_data_property("productName", "Product", "string", label="product name")
    s.add_data_property("price", "Product", "decimal", label="price")
    s.add_data_property("rating", "Review", "integer", label="rating")
    s.add_data_property("reviewText", "Review", "string", label="review text")


def _event(s: TripleStore) -> None:
    s.add_class("Event", label="Event")
    s.add_class("Location", label="Location")
    s.add_class("Participant", label="Participant")
    s.add_class("Organizer", parent="Participant", label="Organizer")
    s.add_object_property("hasLocation", "Event", "Location", label="has location")
    s.add_object_property("hasParticipant", "Event", "Participant",
                          label="has participant")
    s.add_object_property("organizedBy", "Event", "Organizer", label="organized by")
    s.add_data_property("eventName", "Event", "string", label="event name")
    s.add_data_property("startDate", "Event", "dateTime", label="start date")
    s.add_data_property("endDate", "Event", "dateTime", label="end date")
    s.add_data_property("locationName", "Location", "string", label="location name")
    s.add_data_property("address", "Location", "string", label="address")


def _person_contact(s: TripleStore) -> None:
    s.add_class("Person", label="Person")
    s.add_class("Address", label="Address")
    s.add_class("ContactInfo", label="Contact Info")
    s.add_object_property("hasAddress", "Person", "Address", label="has address")
    s.add_object_property("hasContact", "Person", "ContactInfo", label="has contact")
    s.add_object_property("knows", "Person", "Person", label="knows", symmetric=True)
    s.add_data_property("firstName", "Person", "string", label="first name")
    s.add_data_property("lastName", "Person", "string", label="last name")
    s.add_data_property("birthDate", "Person", "date", label="birth date")
    s.add_data_property("email", "ContactInfo", "string", label="email")
    s.add_data_property("phone", "ContactInfo", "string", label="phone")
    s.add_data_property("street", "Address", "string", label="street")
    s.add_data_property("city", "Address", "string", label="city")
    s.add_data_property("postalCode", "Address", "string", label="postal code")
    s.add_data_property("country", "Address", "string", label="country")


def _skos_thesaurus(s: TripleStore) -> None:
    # NB: the reference template's prefLabels are PLAIN literals (no
    # @en tag) — lang="" matches templates.py:275-313 exactly
    s.add_concept_scheme("MainScheme", label="Main Scheme")
    s.add_concept("Science", "MainScheme", pref_label="Science", lang="")
    s.add_concept("NaturalScience", "MainScheme", pref_label="Natural Science",
                  broader="Science", lang="")
    s.add_concept("SocialScience", "MainScheme", pref_label="Social Science",
                  broader="Science", lang="")
    s.add_concept("Physics", "MainScheme", pref_label="Physics",
                  broader="NaturalScience", lang="")
    s.add_concept("Biology", "MainScheme", pref_label="Biology",
                  broader="NaturalScience", lang="")
    s.add_concept("Economics", "MainScheme", pref_label="Economics",
                  broader="SocialScience", lang="")


_BUILDERS: Dict[str, Callable[[TripleStore], None]] = {
    "Organization": _organization,
    "Product Catalog": _product_catalog,
    "Event": _event,
    "Person / Contact": _person_contact,
    "SKOS Thesaurus": _skos_thesaurus,
}

TEMPLATE_DESCRIPTIONS = {
    "Organization": "Organization structure with departments, persons, and roles.",
    "Product Catalog": "Product catalog with categories, brands, and reviews.",
    "Event": "Events with locations, participants, and organizers.",
    "Person / Contact": "Person and contact information with addresses.",
    "SKOS Thesaurus": "SKOS ConceptScheme with sample broader/narrower concepts.",
}


def get_template_names() -> List[str]:
    return list(_BUILDERS)


def build_template(name: str,
                   base_uri: str = "http://example.org/ontology#") -> TripleStore:
    """Instantiate a template as a fresh store ({base_uri} substitution
    analog of templates.py:331-333)."""
    builder = _BUILDERS.get(name)
    if builder is None:
        raise KeyError(f"Unknown template: {name}")
    store = TripleStore(base_uri)
    builder(store)
    return store


def apply_template(store: TripleStore, name: str, merge: bool = True) -> dict:
    """Merge-or-replace template apply (app.py Templates tab)."""
    from .graph import IMPORT_MERGE, IMPORT_REPLACE
    other = build_template(name, store.base_uri)
    return store.merge_from(other, IMPORT_MERGE if merge else IMPORT_REPLACE)
