"""Config hygiene: no dead flags (VERDICT round-2 missing #2/3/5).

Every declared config field must be read somewhere outside config.py —
a flag that silently does nothing is worse than its absence.
"""

import dataclasses
import pathlib
import re

from medplib_tpu import config as C

REPO = pathlib.Path(__file__).resolve().parent.parent


def _non_config_source() -> str:
    out = []
    for p in REPO.rglob("*.py"):
        sp = str(p)
        if ("__pycache__" in sp or ".jax_cache" in sp
                or sp.endswith("medplib_tpu/config.py")):
            continue
        out.append(p.read_text())
    return "\n".join(out)


def test_every_config_field_is_referenced_outside_config():
    src = _non_config_source()
    missing = []
    for cls in C._CONFIG_TYPES.values():
        for f in dataclasses.fields(cls):
            if not re.search(r"\b" + re.escape(f.name) + r"\b", src):
                missing.append(f"{cls.__name__}.{f.name}")
    assert not missing, f"declared-but-never-read config fields: {missing}"


def test_from_json_drops_unknown_keys():
    # checkpoints persisted with an older schema (e.g. the removed
    # MoeConfig.ep_size) must still load
    import json
    s = C.to_json(C.MoeConfig(enable=True, num_experts=4))
    d = json.loads(s)
    d["ep_size"] = 2  # legacy field
    cfg = C.from_json(json.dumps(d))
    assert cfg.num_experts == 4 and cfg.enable


def test_config_json_round_trip():
    cfg = C.MedplibConfig.tiny()
    assert C.from_json(C.to_json(cfg)) == cfg
