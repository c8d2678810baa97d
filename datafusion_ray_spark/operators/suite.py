"""Extension-operator suite entries (filled in as operators land)."""

from __future__ import annotations


def extension_entries():
    from ..queries.registry import SuiteEntry  # noqa: F401 (type only)

    return []
