"""Layered engine configuration: defaults < YAML file < explicit overrides.

The reference resolves its runtime knobs the same way (hard-coded
defaults, then ``config.yaml``, then CLI flags — scraper_v2.py:341-409,
1620-1672). Here the resolved config is a plain frozen mapping that
parameterizes operators (field lists become ``isin`` filters, thresholds
become literals); it never changes schemas, matching how the reference
treats configurable field lists (scraper_v2.py:1190-1196).

YAML parsing is gated behind an import-try: the engine only needs it
when a config file is actually supplied.
"""

from __future__ import annotations

import copy
import json
from typing import Any, Mapping

# Income-statement + balance-sheet field lists mirror the reference's
# configurable extraction schema (scraper_v2.py:146-177, config.yaml:133-162).
DEFAULTS: dict[str, Any] = {
    "matching": {
        "similarity_threshold": 0.95,  # scraper_v2.py:142
        "max_pages": 20,               # scraper_v2.py:1609
        "require_thai_suffix": True,   # thai_filter toggle, scraper_v2.py:364
    },
    "extraction": {
        "mode": "full",                # "full" | "revenue_only" (scraper_v2.py:1292)
        "include_balance_sheet": True, # scraper_v2.py:180
        "income_fields": [
            "รายได้รวม", "รายได้จากการขายและบริการ", "ต้นทุนขายสินค้าและบริการ",
            "กำไรขั้นต้น", "ค่าใช้จ่ายในการขายและบริหาร", "กำไรจากการดำเนินงาน",
            "ดอกเบี้ยจ่าย", "กำไรก่อนภาษีเงินได้", "ภาษีเงินได้", "กำไรสุทธิ",
        ],
        "balance_fields": [
            "สินทรัพย์หมุนเวียน", "สินทรัพย์ไม่หมุนเวียน", "สินทรัพย์รวม",
            "หนี้สินหมุนเวียน", "หนี้สินไม่หมุนเวียน", "หนี้สินรวม",
            "ทุนจดทะเบียน", "ทุนที่ออกและชำระแล้ว", "ส่วนของผู้ถือหุ้น",
            "กำไรสะสม", "หนี้สินรวมและส่วนของผู้ถือหุ้น",
        ],
        "target_years": None,          # None = all years (scraper_v2.py:127)
    },
    "fetch": {
        "max_retries": 3,              # scraper_v2.py:138
        "retry_extra_wait": 0.0,       # backoff unit; 0 in tests
        "delay_between_requests": 0.0, # politeness delay per row; 0 in tests
        "profile_prefixes": ["5", "7", "6", "3", ""],  # scraper_v2.py:1259
        # politeness parallelism: partitions × per-row delay bounds the
        # cluster-wide request rate (the reference's --workers,
        # scraper_v2.py:1606); None lets Spark choose
        "fetch_partitions": None,
    },
    "io": {
        "batch_size": 20,              # micro-batch durability, scraper_v2.py:129
        "output_format": "parquet",
        "backup_on_overwrite": False,
    },
    "spark": {
        "shuffle_partitions": 32,
        "target_partition_bytes": 128 * 1024 * 1024,
    },
}


def _deep_merge(base: dict[str, Any], override: Mapping[str, Any]) -> dict[str, Any]:
    out = copy.deepcopy(base)
    for key, value in override.items():
        if isinstance(value, Mapping) and isinstance(out.get(key), dict):
            out[key] = _deep_merge(out[key], value)
        else:
            out[key] = copy.deepcopy(value)
    return out


def load_config(
    yaml_path: str | None = None,
    overrides: Mapping[str, Any] | None = None,
) -> dict[str, Any]:
    """Resolve the layered config: DEFAULTS < yaml_path < overrides."""
    conf = copy.deepcopy(DEFAULTS)
    if yaml_path:
        try:
            import yaml  # type: ignore
        except ImportError:
            with open(yaml_path, "r", encoding="utf-8") as fh:
                file_conf = json.load(fh)  # JSON is valid YAML; degrade gracefully
        else:
            with open(yaml_path, "r", encoding="utf-8") as fh:
                file_conf = yaml.safe_load(fh) or {}
        conf = _deep_merge(conf, file_conf)
    if overrides:
        conf = _deep_merge(conf, overrides)
    return conf


def generate_default_config(path: str) -> str:
    """Write the default config file (the reference's --generate-config,
    scraper_v2.py:1616-1618). YAML when available, JSON otherwise (JSON
    is valid YAML, so ``load_config`` reads either back)."""
    try:
        import yaml  # type: ignore

        body = yaml.safe_dump(DEFAULTS, allow_unicode=True, sort_keys=False)
    except ImportError:
        body = json.dumps(DEFAULTS, ensure_ascii=False, indent=2)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(body)
    return path


def active_fields(conf: Mapping[str, Any]) -> list[str]:
    """Field whitelist implied by the extraction config (the reference's
    revenue_only legacy mode is just a one-element field list,
    scraper_v2.py:1292-1305)."""
    ext = conf["extraction"]
    if ext["mode"] == "revenue_only":
        return ["รายได้รวม"]
    fields = list(ext["income_fields"])
    if ext["include_balance_sheet"]:
        fields += list(ext["balance_fields"])
    return fields
