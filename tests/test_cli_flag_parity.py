"""Drop-in CLI parity: every option flag a reference script accepts must be
registered by our same-named script.

The scripts follow the repo convention of building ``parser`` at module
top level with heavy imports deferred into ``__main__``, so each module
imports cheaply and its ``parser._option_string_actions`` lists exactly
the accepted option strings (long names and short aliases)."""
import importlib.util
import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

_FLAG_RE = re.compile(
    r"add_argument\(\s*((?:['\"]-{1,2}[\w-]+['\"]\s*,?\s*)+)", re.S
)
_OPT_RE = re.compile(r"['\"](-{1,2}[\w-]+)['\"]")


def _reference_flags(path):
    src = open(path).read()
    flags = []
    for m in _FLAG_RE.finditer(src):
        flags.extend(_OPT_RE.findall(m.group(1)))
    return sorted(set(flags))


def _load_parser(script):
    spec = importlib.util.spec_from_file_location(
        f"cli_parity_{script[:-3]}", os.path.join(REPO, script)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.parser


def _scripts():
    if not os.path.isdir(REF):
        return []
    out = []
    for f in sorted(os.listdir(REF)):
        if f.endswith(".py") and os.path.exists(os.path.join(REPO, f)):
            flags = _reference_flags(os.path.join(REF, f))
            if flags:
                out.append((f, flags))
    return out


@pytest.mark.parametrize("script,ref_flags", _scripts(),
                         ids=[s for s, _ in _scripts()])
def test_reference_flags_accepted(script, ref_flags):
    parser = _load_parser(script)
    accepted = set(parser._option_string_actions)
    missing = [f for f in ref_flags if f not in accepted]
    assert not missing, f"{script} missing reference flags: {missing}"
