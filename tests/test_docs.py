"""docs/api.md freshness: the committed index must match the generator.

The index went stale once (round 4 added models/manifests.py,
ops/pallas/fused_predict.py and the serving-queue surface without a
regeneration); this pin turns a changed public API surface into a CI
failure until `python docs/gen_api.py` is re-run.
"""

import importlib.util
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]


def _load_gen_api():
    spec = importlib.util.spec_from_file_location(
        "gen_api", REPO / "docs" / "gen_api.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_api_index_is_fresh():
    gen = _load_gen_api()
    committed = (REPO / "docs" / "api.md").read_text()
    assert gen.render() == committed, (
        "docs/api.md is stale — regenerate with: "
        "JAX_PLATFORMS=cpu python docs/gen_api.py")
