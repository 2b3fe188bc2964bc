"""User-space BVH build API (rtcBuildBVH analog, rtcore_builder.cpp)."""
import numpy as np
import pytest

from embree_tpu import rtcore as rtc
from embree_tpu.build.user_builder import (BuildArguments, BuildCancelled,
                                           BuildQualityEnum, build_user_bvh)
from embree_tpu.render.tutorials.bvh_builder import (InnerNode, LeafNode,
                                                     build,
                                                     make_random_prims,
                                                     split_primitive)


def _collect_prims(root):
    out = []
    stack = [root]
    while stack:
        n = stack.pop()
        if isinstance(n, LeafNode):
            out.extend(p.prim_id for p in n.prims)
        else:
            stack.extend(n.children)
    return sorted(out)


@pytest.mark.parametrize("quality", [BuildQualityEnum.LOW,
                                     BuildQualityEnum.MEDIUM])
def test_build_covers_all_prims(quality):
    lower, upper = make_random_prims(500)
    root, _ = build(quality, lower, upper)
    assert _collect_prims(root) == list(range(500))


def test_high_quality_duplicates_prims():
    lower, upper = make_random_prims(500)
    root, _ = build(BuildQualityEnum.HIGH, lower, upper)
    prims = _collect_prims(root)
    # presplits duplicate up to (factor-1)*N references
    assert len(prims) > 500
    assert set(prims) == set(range(500))


def test_branching_factor_4():
    lower, upper = make_random_prims(300)
    root, _ = build(BuildQualityEnum.MEDIUM, lower, upper, branching=4)
    stack, max_children = [root], 0
    while stack:
        n = stack.pop()
        if isinstance(n, InnerNode):
            max_children = max(max_children, len(n.children))
            assert len(n.children) <= 4
            stack.extend(n.children)
    assert max_children > 2


def test_sah_quality_ordering():
    lower, upper = make_random_prims(2000)
    low, _ = build(BuildQualityEnum.LOW, lower, upper)
    med, _ = build(BuildQualityEnum.MEDIUM, lower, upper)
    assert med.sah() < low.sah()


def test_progress_cancellation():
    lower, upper = make_random_prims(100)
    args = BuildArguments(
        create_node=lambda n: InnerNode(),
        set_node_children=lambda node, ch: node.children.extend(ch),
        set_node_bounds=lambda node, bs: node.bounds.extend(bs),
        create_leaf=lambda prims: LeafNode(prims),
        progress=lambda f: f < 0.25)
    with pytest.raises(BuildCancelled):
        build_user_bvh(args, lower, upper)


def test_rtcore_shim_roundtrip():
    dev = rtc.rtcNewDevice("ignore_config_files=1")
    bvh = rtc.rtcNewBVH(dev)
    args = rtc.rtcDefaultBuildArguments()
    args.create_node = lambda n: InnerNode()
    args.set_node_children = lambda node, ch: node.children.extend(ch)
    args.set_node_bounds = lambda node, bs: node.bounds.extend(bs)
    args.create_leaf = lambda prims: LeafNode(prims)
    lower, upper = make_random_prims(64)
    root = rtc.rtcBuildBVH(bvh, args, lower, upper)
    assert _collect_prims(root) == list(range(64))
    rtc.rtcReleaseBVH(bvh)


def test_bvh_access_walk():
    from embree_tpu.render.tutorials.bvh_access import build_scene, print_bvh4
    _, cs = build_scene()
    lines = []
    stats = print_bvh4(cs, out=lines.append)
    assert stats["prims"] == 14
    assert any("Triangle geomID=1" in ln for ln in lines)
