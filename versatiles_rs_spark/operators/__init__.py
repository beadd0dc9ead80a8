"""Tile-stream operators: each is a function DataFrame -> DataFrame.

The registry mirrors the reference's operator factory
(/root/reference/versatiles_pipeline/src/operations/mod.rs:8-33); operators
compose left-to-right like VPL pipeline stages.
"""

from __future__ import annotations

OPERATOR_REGISTRY: dict = {}


def register_operator(name: str):
    def deco(fn):
        OPERATOR_REGISTRY[name] = fn
        return fn

    return deco
