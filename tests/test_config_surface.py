"""Config-surface parity sweep (VERDICT r1 item 9): every key a shipped
recipe YAML sets must exist in the defaults tree (no silently-ignored
knobs), and the moving knobs actually switch behavior."""
import glob
import os

import numpy as np
import pytest
import yaml

from sings_tpu.config.core import deep_merge
from sings_tpu.config.defaults import DEFAULTS

CONFIG_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "configs")

# keys the reference YAML surface carries that are deliberately not in
# the defaults tree (documented in PARITY.md): none currently.
ALLOWED_EXTRA: set = set()


def _walk(d, prefix=""):
    for k, v in d.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict) and not _is_leaf_dict(path):
            yield from _walk(v, path)
        else:
            yield path


def _is_leaf_dict(path):
    # region-weight dicts are leaf VALUES (name -> weight), not config
    # subtrees
    return path.endswith("_regions_w")


@pytest.mark.parametrize(
    "recipe", sorted(glob.glob(os.path.join(CONFIG_DIR, "human_*.yaml")))
)
def test_recipe_keys_all_exist_in_defaults(recipe):
    with open(recipe) as fh:
        y = yaml.safe_load(fh)
    base = DEFAULTS

    def exists(path):
        node = base
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                return False
            node = node[part]
        return True

    missing = [p for p in _walk(y) if not exists(p)
               and p not in ALLOWED_EXTRA]
    assert not missing, (
        f"{os.path.basename(recipe)} sets knobs absent from "
        f"config/defaults.py (accepted-but-ignored): {missing}")
    # and the merge round-trips
    from sings_tpu.config.core import Config

    cfg = deep_merge(Config.wrap(base), y)
    assert cfg.human.loss.laplacian.type in ("standard", "cotangent")


def test_anim_recipe_keys_exist():
    """Anim recipes are standalone little YAMLs consumed as kwargs of
    load_anim_dataset (reference cfgs/anim/custom.yaml contract)."""
    import inspect

    from sings_tpu.data.anim import load_anim_dataset

    accepted = set(inspect.signature(load_anim_dataset).parameters)
    for recipe in sorted(glob.glob(os.path.join(CONFIG_DIR,
                                                "anim_*.yaml"))):
        with open(recipe) as fh:
            y = yaml.safe_load(fh)
        unknown = set(y) - accepted
        assert not unknown, (
            f"{os.path.basename(recipe)}: unknown anim knobs {unknown}")


def test_laplacian_type_knob_switches_builders():
    """'standard' and 'cotangent' build different laplacian structures;
    'norm' raises NotImplementedError like the reference
    (loss_items.py:111-113)."""
    from sings_tpu.losses.regularizers import (
        CotRegionLaplacian, RegionLaplacian, build_cot_region_laplacian,
        build_region_laplacian,
    )

    verts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]])
    faces = np.array([[0, 1, 2], [1, 3, 2]])
    edges = np.array([[0, 1], [1, 2], [0, 2], [1, 3], [2, 3]])
    labels = np.zeros(4, np.int64)
    w = np.ones(1, np.float32)
    std = build_region_laplacian(edges, labels, w, num_regions=1)
    cot = build_cot_region_laplacian(verts, faces, labels, w, num_regions=1)
    assert isinstance(std, RegionLaplacian)
    assert isinstance(cot, CotRegionLaplacian)
