"""Construction tests for the HTTP serving layer (api.create_app, K7).

fastapi is not installed in every environment (not in this container), so
the app can only be constructed where it exists; what IS testable
everywhere is the gate contract: absent fastapi, ``create_app`` raises
NotImplementedError pointing at the static-export alternative, and never
at import time. Where fastapi exists, the route set must be the
reference's: the three data endpoints plus the ``GET /`` service-info
root (reference src/api/main.py:24-26).
"""

from __future__ import annotations

import pytest

from nyc_open_data_pipeline_spark.api import create_app

try:
    import fastapi  # noqa: F401

    _HAVE_FASTAPI = True
except ImportError:
    _HAVE_FASTAPI = False


def test_import_never_requires_fastapi():
    # the import at module top already proved this; keep the assertion
    # explicit so a future eager fastapi import fails THIS test by name
    assert callable(create_app)


@pytest.mark.skipif(_HAVE_FASTAPI, reason="fastapi installed: gate inactive")
def test_create_app_gates_on_missing_fastapi(tmp_path):
    with pytest.raises(NotImplementedError, match="export_static"):
        create_app(None, str(tmp_path))


@pytest.mark.skipif(not _HAVE_FASTAPI, reason="fastapi not installed")
def test_route_set_matches_reference(tmp_path):
    app = create_app(None, str(tmp_path))
    paths = {r.path for r in app.routes}
    assert {
        "/",
        "/api/food-gaps",
        "/api/poverty-by-zip",
        "/api/rent-by-zip",
    } <= paths
