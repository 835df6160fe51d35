from .loader import (
    NoneDict,
    dict_to_nonedict,
    dict2str,
    load_json,
    parse,
    parse_config,
    apply_debug_overrides,
)

__all__ = [
    "NoneDict",
    "dict_to_nonedict",
    "dict2str",
    "load_json",
    "parse",
    "parse_config",
    "apply_debug_overrides",
]
