"""Operator package. ``load_all_catalogs()`` imports every module that
registers entries in catalog.REGISTRY, so callers (driver contract,
bench, tests, tools) share one source of truth for the operator set."""


def load_all_catalogs():
    from . import (  # noqa: F401
        catalog,
        catalog_engine,
        catalog_gaps,
        catalog_serp,
        catalog_stream,
        multimodal,
        pipeline,
    )

    return catalog.REGISTRY
