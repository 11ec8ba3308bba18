"""Connection-config resolution — the reference's YAML config model.

kafi resolves a storage by NAME: ``Local("local")`` loads
``local.yaml`` through a ``KAFI_HOME`` search path and validates the
storage kind's mandatory section (kafi/storage.py:140-163). This module
reproduces that observable behavior for the Spark engine:

* search order ``$KAFI_HOME/configs/<kind>/``, ``$KAFI_HOME/configs/``,
  ``$KAFI_HOME/`` — the reference's loop does NOT stop at the first hit,
  so a file later in the list (closer to the home root) OVERRIDES an
  earlier one; we preserve that quirk;
* both ``.yaml`` and ``.yml`` accepted (``.yaml`` preferred within a
  directory, matching the reference's elif);
* mandatory sections raise; optional sections default to ``{}``;
* a ``kafi`` section carries the engine knobs, defaulted like
  kafi/storage.py:29-88;
* ``list_configs`` mirrors ``configs(pattern)`` glob listing
  (kafi/storage.py:165-188).

YAML parsing is gated behind an import-try: JSON configs (``.yaml``
containing JSON is valid YAML, and plain ``json.loads`` covers the
no-PyYAML case for flat configs) keep the model usable anywhere.
"""

from __future__ import annotations

import fnmatch
import json
import os
from typing import Any

try:  # PyYAML is present in most Spark images; JSON fallback otherwise
    import yaml as _yaml
except ImportError:  # pragma: no cover
    _yaml = None

#: engine knobs + defaults (reference: kafi/storage.py:29-88)
KAFI_DEFAULTS: dict[str, Any] = {
    "consume.batch.size": 1000,
    "produce.batch.size": 1000,
    "auto.offset.reset": "earliest",
    "enable.auto.commit": False,
    "key.type": "str",
    "value.type": "json",
    "topic.ignore.patterns": ["_*"],
}


def _home() -> str:
    return os.environ.get("KAFI_HOME") or "."


def _parse(path: str) -> dict:
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    if _yaml is not None:
        return _yaml.safe_load(text) or {}
    return json.loads(text)


def load_config(
    name: str,
    kind_dir: str,
    mandatory: list[str],
    optional: list[str] = ("kafi", "schema_registry"),
) -> dict:
    """Resolve ``<name>.yaml``/``.yml`` through the KAFI_HOME search path
    and validate/default its sections. Raises FileNotFoundError when no
    file is found and KeyError when a mandatory section is missing."""
    home = _home()
    search = [
        os.path.join(home, "configs", kind_dir),
        os.path.join(home, "configs"),
        home,
    ]
    config: dict | None = None
    for d in search:  # last hit wins, matching the reference's loop
        for ext in (".yaml", ".yml"):
            p = os.path.join(d, name + ext)
            if os.path.exists(p):
                config = _parse(p)
                break
    if config is None:
        raise FileNotFoundError(
            f"no configuration {name}.yaml/.yml under {search} "
            "(hint: set KAFI_HOME)"
        )
    # a section left EMPTY in YAML ('local:' with nothing under it)
    # parses to None — normalize to {} FIRST, so the mandatory check
    # fails at load time with the intended KeyError on missing keys
    # downstream instead of a later "'NoneType' is not subscriptable",
    # and setdefault actually fills optional sections (round-8 review)
    for section, val in list(config.items()):
        if val is None:
            config[section] = {}
    for section in mandatory:
        if section not in config:
            raise KeyError(
                f"configuration {name!r} lacks mandatory section {section!r}"
            )
    for section in optional:
        config.setdefault(section, {})
    kafi = dict(KAFI_DEFAULTS)
    kafi.update(config.get("kafi") or {})
    config["kafi"] = kafi
    return config


def list_configs(kind_dir: str, pattern: str = "*") -> list[str]:
    """Config names (file stems) under ``$KAFI_HOME/configs/<kind>``
    matching the glob — the reference's ``configs()`` listing."""
    d = os.path.join(_home(), "configs", kind_dir)
    names = set()
    if os.path.isdir(d):
        for f in os.listdir(d):
            stem, ext = os.path.splitext(f)
            if ext in (".yaml", ".yml") and fnmatch.fnmatch(stem, pattern):
                names.add(stem)
    return sorted(names)
