"""Re-tag YAML config source (S9 in SURVEY.md §2.1).

Reference parity: /root/reference/src/config.rs:10-53 —
``{config: {skip-unmapped: bool}, mapping: {<prefix>: {tags: {k: v}}}}``;
the mapping assigns fixed labels per zip-internal directory prefix
(``__root__`` for top-level members, metricstore.rs:648-659). Files whose
prefix has no mapping entry are skipped (metricstore.rs:82-84).
"""

from __future__ import annotations

from pathlib import Path

import yaml

ROOT_PREFIX = "__root__"


def read_mapping(path: str | Path) -> dict[str, dict[str, str]]:
    """Parse the re-tag YAML into {prefix: {label: value}}."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    result: dict[str, dict[str, str]] = {}
    for prefix, entry in (raw.get("mapping") or {}).items():
        tags = (entry or {}).get("tags") or {}
        result[str(prefix)] = {str(k): str(v) for k, v in tags.items()}
    return result


def member_prefix(member_name: str) -> str:
    """Zip-internal directory prefix of a member (metricstore.rs:648-659)."""
    parts = member_name.replace("\\", "/").rsplit("/", 1)
    return parts[0] if len(parts) == 2 and parts[0] else ROOT_PREFIX
