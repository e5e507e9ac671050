"""JSON input loading for witness generation.

Mirrors the host protocol of the reference calculators
(code_producers/src/wasm_elements/common/witness_calculator.js:278-330 and
c_elements/common/main.cpp:144-225): values may be numbers, decimal or
hex strings, booleans, or nested arrays; negative values reduce mod p.
Bus dot-path qualification ("p.x") arrives with bus support.
"""

import json

from ..utils.reports import Report


def _to_int(v, p):
    if isinstance(v, bool):
        return int(v) % p
    if isinstance(v, int):
        return v % p
    if isinstance(v, float):
        if v != int(v):
            raise Report.error(f"non-integer input value {v}", "T3010")
        return int(v) % p
    if isinstance(v, str):
        s = v.strip()
        try:
            return int(s, 16 if s.lower().startswith("0x") else 10) % p
        except ValueError:
            raise Report.error(f"cannot parse input value {v!r}", "T3010")
    raise Report.error(f"unsupported input value type {type(v).__name__}",
                      "T3010")


def _convert(v, p):
    if isinstance(v, list):
        return [_convert(x, p) for x in v]
    return _to_int(v, p)


def load_inputs(path_or_dict, p: int) -> dict:
    """input.json -> {signal name: int | nested lists of int}."""
    if isinstance(path_or_dict, dict):
        data = path_or_dict
    else:
        with open(path_or_dict) as f:
            data = json.load(f)
    return {name: _convert(v, p) for name, v in data.items()}
