"""Subdivision-surface evaluation entry points (filled in by the subdiv
milestone; see subdiv/catmull_clark.py). This module keeps Scene.commit's
import stable while the full Catmull-Clark pipeline lands."""
from __future__ import annotations


def tessellate_to_triangles(mesh, subdivision_level: int):
    from .tessellate import tessellate_mesh_to_triangles
    return tessellate_mesh_to_triangles(mesh, subdivision_level)
