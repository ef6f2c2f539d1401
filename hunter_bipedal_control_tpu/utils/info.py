"""Boost property-tree ``.info`` file parser / writer.

The reference configures everything through Boost ptree ``.info`` files
(task.info / reference.info / gait.info, loaded via loadData::loadPtreeValue
and loadEigenMatrix all over, e.g. legged_interface/src/LeggedInterface.cpp
:87-96, legged_wbc/src/WbcBase.cpp:352-411).  This module parses the same
format so a user's existing config files drop straight in.

Grammar subset (matches the files the reference ships):
  - ``key value`` pairs; values may carry trailing ``;`` or comments
  - ``; comment`` and ``// comment`` lines
  - nested blocks:  ``name\n{\n ... \n}``
  - Eigen matrix entries:  ``(i,j) value``
  - list entries:  ``[i] value``
"""
from __future__ import annotations

import re
from typing import Any


def loads(text: str) -> dict:
    """Parse .info text into a nested dict.  Matrix/list entries appear as
    '(i,j)' / '[i]' string keys; use `get_matrix` / `get_list` to decode."""
    tokens = []
    for raw in text.splitlines():
        line = raw.split(";")[0].split("//")[0].strip()
        if not line:
            continue
        tokens.append(line)

    root: dict = {}
    stack = [root]
    pending_key = None
    for line in tokens:
        if line == "{":
            d: dict = {}
            if pending_key is None:
                raise ValueError("block without a name")
            stack[-1][pending_key] = d
            stack.append(d)
            pending_key = None
            continue
        if line == "}":
            stack.pop()
            continue
        m = re.match(r"^(\(|\[)?\s*([^\s]+?)\s+(.*)$", line)
        if m and m.group(3):
            key = (m.group(1) or "") + m.group(2)
            stack[-1][key] = _convert(m.group(3).strip())
            pending_key = None
        else:
            # bare token: block name (brace on next line) or could open inline
            if pending_key is not None:
                stack[-1][pending_key] = None
            pending_key = line
    return root


def load(path: str) -> dict:
    with open(path) as f:
        return loads(f.read())


def _convert(v: str):
    v = v.strip()
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    try:
        if re.match(r"^[-+]?\d+$", v):
            return int(v)
        return float(v)
    except ValueError:
        return v


def get(tree: dict, dotted: str, default=None):
    """loadPtreeValue: fetch 'a.b.c'."""
    cur: Any = tree
    for part in dotted.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return default
        cur = cur[part]
    return cur


def get_matrix(tree: dict, dotted: str):
    """loadEigenMatrix: decode '(i,j) value' entries into a dense nested
    list (row-major, scaled by optional 'scaling' entry)."""
    import numpy as np

    block = get(tree, dotted)
    if block is None:
        return None
    entries = {}
    scaling = 1.0
    for k, v in block.items():
        if k == "scaling":
            scaling = float(v)
            continue
        m = re.match(r"^\((\d+),(\d+)\)$", k)
        if m:
            entries[(int(m.group(1)), int(m.group(2)))] = float(v)
    if not entries:
        return None
    rows = max(i for i, _ in entries) + 1
    cols = max(j for _, j in entries) + 1
    M = np.zeros((rows, cols))
    for (i, j), v in entries.items():
        M[i, j] = v
    return scaling * M


def get_list(tree: dict, dotted: str):
    """Decode '[i] value' entries into an ordered python list."""
    block = get(tree, dotted)
    if block is None:
        return None
    items = {}
    for k, v in block.items():
        m = re.match(r"^\[(\d+)\]$", k)
        if m:
            items[int(m.group(1))] = v
    return [items[i] for i in sorted(items)]


def dumps(tree: dict, indent: int = 0) -> str:
    """Write a nested dict back to .info text."""
    out = []
    pad = "  " * indent
    for k, v in tree.items():
        if isinstance(v, dict):
            out.append(f"{pad}{k}")
            out.append(pad + "{")
            out.append(dumps(v, indent + 1))
            out.append(pad + "}")
        else:
            if isinstance(v, bool):
                v = "true" if v else "false"
            out.append(f"{pad}{k}   {v}")
    return "\n".join(out)
