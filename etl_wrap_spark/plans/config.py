"""Config model (SURVEY §2.11): the reference's four-level cascade —
site %config → script %common → per-load @loads[i] → CLI overrides —
with schema validation against a key dictionary (cf. setupConfigMerge,
Wrap/Common.pm:349-367, and %hashCheck, Wrap/Common.pm:21-202).

Configs are DATA (dicts), never executable code — a deliberate change
from the reference's eval'd Perl config files (Wrap.pm:46-60),
documented in SURVEY §7.4.
"""

from __future__ import annotations

import re
from typing import Any

# Key dictionary: namespace → key → expected type(s). The engine's
# equivalent of %hashCheck; unknown keys error at setup (not at use).
CONFIG_SCHEMA: dict[str, dict[str, type | tuple[type, ...]]] = {
    "File": {
        "filename": str,
        "format_sep": str,
        "format_header": str,
        "format_targetheader": str,
        "format_skip": (int, str),
        "format_quotedcsv": bool,
        "format_poslen": list,
        "format_padding": list,
        "format_dateColumns": list,
        "format_headerColumns": list,
        "format_stopOnEmptyValueColumn": str,
        "format_suppressHeader": bool,
        "format_sepHead": str,
        "format_beforeHeader": str,
        "format_normalize": bool,
        "format_thousandsep": str,
        "format_decimalsep": str,
        "format_encoding": str,
        "format_eol": str,
        "format_allowLinefeedInData": bool,
        "format_xpathRecordLevel": str,
        "format_fieldXpath": dict,
        "worksheet": (str, int),
        "localFilesystemPath": str,
    },
    "DB": {
        "table": str,
        "query": str,
        "keyfield": str,
        "primkey": list,
        "upsert": bool,
        "doUpdateBeforeInsert": bool,
        "deleteBeforeInsertSelector": str,
        "incrementalStore": bool,
        "ignoreDuplicateErrs": bool,
        "keepContent": bool,
        "addID": dict,
        "identityColumns": list,
        "schemaName": str,
    },
    "process": {
        "interactive": bool,
        "skipHolidays": (bool, str),
        "skipWeekends": bool,
        "skipForFirstBusinessDate": (bool, str),
        "holidayCalendar": str,
        "retrySeconds": int,
        "plannedUntil": str,
        "additionalLookup": str,
        "additionalLookupKeys": list,
        "uploadCMD": str,
    },
}

_LOAD_KEY = re.compile(r"^load(\d+)(\w+)$")


class ConfigError(ValueError):
    pass


def deep_merge(base: dict, overlay: dict) -> dict:
    """Recursive dict merge; overlay wins on scalar conflicts (the
    reference's 'load-level wins' precedence)."""
    out = dict(base)
    for k, v in overlay.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def validate(cfg: dict, schema: dict = CONFIG_SCHEMA) -> None:
    """%hashCheck enforcement (Wrap/Common.pm:223-240): unknown keys and
    type mismatches are setup-time errors."""
    for ns, keys in cfg.items():
        if ns not in schema:
            raise ConfigError(f"unknown config namespace <{ns}>; have {sorted(schema)}")
        if not isinstance(keys, dict):
            raise ConfigError(f"namespace <{ns}> must be a dict")
        for k, v in keys.items():
            if k not in schema[ns]:
                raise ConfigError(f"unknown key <{ns}.{k}>")
            want = schema[ns][k]
            if not isinstance(v, want):
                raise ConfigError(f"key <{ns}.{k}> expects {want}, got {type(v).__name__}")


def parse_cli_overrides(args: list[str]) -> tuple[dict, dict[int, dict]]:
    """CLI addressing compatible with the reference's getOptions
    (Wrap/Common.pm:370-407): `--DB key=val` overrides the common level,
    `--load3File key=val` overrides load 3's File namespace."""
    common: dict = {}
    per_load: dict[int, dict] = {}
    i = 0
    while i < len(args):
        arg = args[i]
        if not arg.startswith("--"):
            raise ConfigError(f"unparseable argument {arg!r}")
        name = arg[2:]
        if i + 1 >= len(args) or "=" not in args[i + 1]:
            raise ConfigError(f"option {arg} needs a key=value argument")
        key, _, raw = args[i + 1].partition("=")
        value: Any = raw
        if raw.lower() in ("true", "false"):
            value = raw.lower() == "true"
        elif re.fullmatch(r"-?\d+", raw):
            value = int(raw)
        m = _LOAD_KEY.match(name)
        if m:
            idx, ns = int(m.group(1)), m.group(2)
            per_load.setdefault(idx, {}).setdefault(ns, {})[key] = value
        else:
            common.setdefault(name, {})[key] = value
        i += 2
    return common, per_load


def setup_config_merge(
    site: dict,
    common: dict,
    loads: list[dict],
    cli_args: list[str] | None = None,
    schema: dict = CONFIG_SCHEMA,
) -> list[dict]:
    """The four-level cascade → one finalized config per load."""
    cli_common, cli_loads = parse_cli_overrides(cli_args or [])
    merged_common = deep_merge(deep_merge(site, common), cli_common)
    final = []
    for i, load in enumerate(loads):
        cfg = deep_merge(merged_common, load)
        if i in cli_loads:
            cfg = deep_merge(cfg, cli_loads[i])
        validate(cfg, schema)
        final.append(cfg)
    return final


def resolve_secrets(cfg: dict, env: dict | None = None) -> dict:
    """Credential resolution (reference 'sensitive' store lookups,
    Wrap.pm:98-107): string values of the form ``{{ENV:NAME}}`` are
    replaced from the environment (or the supplied mapping) at setup —
    secrets never live in config files. Missing variables are setup-time
    errors."""
    import os as _os

    src = env if env is not None else _os.environ

    def walk(v):
        if isinstance(v, dict):
            return {k: walk(x) for k, x in v.items()}
        if isinstance(v, str):
            def sub(m):
                name = m.group(1)
                if name not in src:
                    raise ConfigError(f"secret reference {{{{ENV:{name}}}}} not set")
                return src[name]
            return re.sub(r"\{\{ENV:([A-Za-z_][A-Za-z0-9_]*)\}\}", sub, v)
        return v

    return walk(cfg)
