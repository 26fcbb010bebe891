import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (local mode)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture
def store():
    """Fresh driver-side store (analog of the reference's `om` fixture,
    tests/conftest.py:5-10)."""
    from orionbelt_ontology_builder_ray.state.graph import TripleStore

    return TripleStore("http://test.org/ont#")


@pytest.fixture
def populated(store):
    """Port of the reference `populated_om` fixture (tests/conftest.py:13-22)."""
    store.add_class("Person", label="Person")
    store.add_class("Organization", label="Organization")
    store.add_class("Employee", parent="Person", label="Employee")
    store.add_object_property("worksFor", domain="Person", range_="Organization")
    store.add_data_property("hasName", domain="Person", range_="string")
    store.add_individual("alice", "Employee", label="Alice")
    store.add_individual("acme", "Organization", label="ACME Corp")
    return store


@pytest.fixture
def skos(store):
    """Port of the reference `skos_om` fixture (tests/conftest.py:26-33)."""
    store.add_concept_scheme("MyScheme", label="My Scheme")
    store.add_concept("Animal", "MyScheme", pref_label="Animal")
    store.add_concept("Dog", "MyScheme", pref_label="Dog", broader="Animal")
    store.add_concept("Cat", "MyScheme", pref_label="Cat", broader="Animal")
    return store
