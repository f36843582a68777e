"""YAML recipe parsing + run directory management.

Reference counterpart: ``config/parser.py`` (``YAMLParser``): loads a YAML
recipe (anchors supported by pyyaml), applies CLI overrides addressed by
``;``-separated paths (``parser.py:93-112``), creates
``<output>/<experiment>/<runid>`` model/log dirs, archives the effective
config, wires logging.  Optimizers/schedulers resolve through the registry in
``training/optim.py`` instead of ``eval()`` (``train.py:653-656``).
"""

from __future__ import annotations

import copy
import datetime
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import yaml

from bmcnet_esr_tpu.utils.logging import setup_logging


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def set_by_path(tree: Dict[str, Any], target: str, value: Any) -> None:
    """Set ``a;b;c`` -> tree['a']['b']['c'] = value (``parser.py:103-107``)."""
    keys = target.split(";")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


class RunConfig:
    """Parsed recipe + run directories + archived effective config."""

    def __init__(
        self,
        config: Dict[str, Any],
        runid: Optional[str] = None,
        overrides: Sequence[Tuple[str, Any]] = (),
        make_dirs: bool = True,
    ):
        self.config = copy.deepcopy(config)
        for target, value in overrides:
            set_by_path(self.config, target, value)

        self.experiment = self.config.get("experiment", "exp")
        self.runid = runid or datetime.datetime.now().strftime("%m%d_%H%M%S")
        output = self.config.get("trainer", {}).get("output_path", "runs/")

        self.save_dir = os.path.join(output, "models", self.experiment, self.runid)
        self.log_dir = os.path.join(output, "logs", self.experiment, self.runid)
        if make_dirs:
            os.makedirs(self.save_dir, exist_ok=True)
            os.makedirs(self.log_dir, exist_ok=True)
            with open(os.path.join(self.save_dir, "config.yml"), "w") as f:
                yaml.safe_dump(self.config, f, default_flow_style=False, sort_keys=False)
            setup_logging(self.log_dir)

    @classmethod
    def from_file(cls, path: str, runid=None, overrides=(), make_dirs=True) -> "RunConfig":
        return cls(load_yaml(path), runid=runid, overrides=overrides, make_dirs=make_dirs)

    def __getitem__(self, key: str) -> Any:
        return self.config[key]

    def get(self, key: str, default: Any = None) -> Any:
        return self.config.get(key, default)
