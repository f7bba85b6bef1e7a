"""Import helper for the read-only reference toolbox used as a test oracle.

The reference PY-TB (/root/reference/tools) is the golden model: our tables
and waveforms are validated against it numerically (SURVEY.md §4). Tests
that need it must call `get_oracle()` and skip if unavailable.
"""
import contextlib
import io
import os
import sys

import pytest

REF_TOOLS = "/root/reference/tools"

_cache = {}


def get_oracle(module="phy80211header"):
    if module in _cache:
        return _cache[module]
    if not os.path.isdir(REF_TOOLS):
        pytest.skip("reference toolbox not available")
    os.environ.setdefault("MPLBACKEND", "Agg")
    if REF_TOOLS not in sys.path:
        sys.path.insert(0, REF_TOOLS)
    # The reference modules print heavily at import/run time; silence them.
    with contextlib.redirect_stdout(io.StringIO()):
        mod = __import__(module)
    _cache[module] = mod
    return mod


@contextlib.contextmanager
def quiet():
    """Suppress the reference's debug prints around oracle calls."""
    with contextlib.redirect_stdout(io.StringIO()):
        yield
