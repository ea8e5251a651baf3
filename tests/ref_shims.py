"""Test-only stand-ins for heavyweight deps the reference SCRIPTS import
(pytorch_lightning, fvcore) so they can be loaded as golden oracles.
Only what module-level import requires: LightningModule as nn.Module and a
minimal dict-backed CfgNode for `dl_cs.config`. NOT shipped code."""

import sys
import types

import torch.nn as nn


class _CfgNode(dict):
    """Tiny fvcore/yacs-style node: attribute access + new_allowed arg."""

    def __init__(self, init_dict=None, copy_list=None, new_allowed=False):
        super().__init__(init_dict or {})

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    @classmethod
    def load_yaml_with_base(cls, filename, allow_unsafe=False):
        import yaml
        with open(filename) as f:
            return yaml.unsafe_load(f) if allow_unsafe else yaml.safe_load(f)

    def merge_from_other_cfg(self, other):
        self.update(other)

    def freeze(self):
        pass

    def defrost(self):
        pass


def install():
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        pl.LightningModule = nn.Module
        pl.seed_everything = lambda *a, **k: None
        sys.modules["pytorch_lightning"] = pl
    if "fvcore" not in sys.modules:
        fv = types.ModuleType("fvcore")
        common = types.ModuleType("fvcore.common")
        config = types.ModuleType("fvcore.common.config")
        config.CfgNode = _CfgNode
        fv.common = common
        common.config = config
        sys.modules["fvcore"] = fv
        sys.modules["fvcore.common"] = common
        sys.modules["fvcore.common.config"] = config
