"""Cross-round golden regression net (reference: golden FAST tables
unittests/feature_fast.cxx:18-60 + MD5s tests_common.cxx:98-116).

goldens/goldens.json pins detector tuples, image-op MD5s (via the native
md5_mat hasher) and estimation hashes on the deterministic CPU backend.
A failure here means BEHAVIOR CHANGED — if intentional, regenerate with
`python scripts/make_goldens.py` and review the diff."""
import importlib.util
import json
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_generator():
    spec = importlib.util.spec_from_file_location(
        "make_goldens", os.path.join(_ROOT, "scripts", "make_goldens.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_goldens_locked():
    with open(os.path.join(_ROOT, "goldens", "goldens.json")) as f:
        locked = json.load(f)
    current = _load_generator().build()
    mismatches = {k: (locked.get(k), current.get(k))
                  for k in set(locked) | set(current)
                  if locked.get(k) != current.get(k)}
    assert not mismatches, (
        "golden values changed — intentional? regenerate via "
        f"scripts/make_goldens.py and review: {mismatches}")
