"""INI configuration (reference H2: conf/Config.h:12-35 — a boost
ptree INI reader with typed ``GetConfig<T>(key)`` and keys like
``storage.PATH``; conf.ini:1).

Same surface, Python-native: ``Conf(path).get("storage.PATH")`` with
optional type coercion and the same key-missing error semantics
(error/error_all.h kConfKeyNotExist → KeyError here).
"""

from __future__ import annotations

import configparser
import os
from typing import Any, TypeVar

T = TypeVar("T")


class Conf:
    def __init__(self, path: str):
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        self._cp = configparser.ConfigParser()
        self._cp.read(path)

    def get(self, dotted_key: str, cast: type | None = None,
            default: Any = ...) -> Any:
        """``get("storage.PATH")`` — section.key, typed when ``cast``
        given. Missing key raises KeyError unless a default is given
        (kConfKeyNotExist analogue)."""
        try:
            section, key = dotted_key.split(".", 1)
            raw = self._cp[section][key]
        except (ValueError, KeyError):
            if default is not ...:
                return default
            raise KeyError(f"config key not found: {dotted_key}") from None
        if cast is bool:
            return raw.strip().lower() in ("1", "true", "yes", "on")
        return cast(raw) if cast else raw

    def spark_conf(self, prefix: str = "spark") -> dict[str, str]:
        """All keys under [spark] as a dict for get_spark(extra_conf=...)."""
        if not self._cp.has_section(prefix):
            return {}
        return dict(self._cp[prefix])
