"""Flax model zoo.

Mirrors the reference's model registry semantics
(``feature_extraction/code/models/__init__.py:19-81``): models register
under an underscored name, expose ``output_dims``, ``model_tag`` and a
preprocessor; ``get_model(name)`` looks them up.
"""

from __future__ import annotations

from typing import Dict, Type

_REGISTRY: Dict[str, type] = {}


def register_model(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        cls.model_name = name
        return cls

    return deco


def get_model(name: str):
    # lazy imports so importing the package stays light
    from . import vggish as _vggish  # noqa: F401
    from . import slowfast as _slowfast  # noqa: F401

    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def model_names():
    from . import vggish as _vggish  # noqa: F401
    from . import slowfast as _slowfast  # noqa: F401

    return sorted(_REGISTRY)
