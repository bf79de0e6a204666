"""Index aliases (ES alias analog) on the version registry: atomic
set/repoint/delete, alias-aware resolution in path()/switch(), shadow
and dangling rules, and delete protection for aliased versions."""

import json
import os

import pytest

from uci_searchengine_spark.registry import IndexRegistry


def _fake_index(root, name):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump({"n_docs": 1}, f)
    return d


@pytest.fixture
def reg(tmp_path):
    root = str(tmp_path / "reg")
    r = IndexRegistry(root)
    _fake_index(root, "v1")
    _fake_index(root, "v2")
    r.switch("v1")
    return r


def test_alias_set_resolve_repoint(reg):
    reg.alias_set("serving", "v1")
    assert reg.aliases() == {"serving": "v1"}
    assert reg.resolve("serving") == "v1"
    assert reg.path("serving") == reg.path("v1")
    # repoint is one atomic write — the zero-downtime cutover
    reg.alias_set("serving", "v2")
    assert reg.resolve("serving") == "v2"
    # plain names and None pass through
    assert reg.resolve("v1") == "v1"
    assert reg.resolve(None) == "v1"


def test_switch_by_alias(reg):
    reg.alias_set("serving", "v2")
    reg.switch("serving")
    assert reg.current() == "v2"  # CURRENT stores the resolved version


def test_alias_rules(reg):
    with pytest.raises(LookupError):
        reg.alias_set("a", "nope")  # target must exist
    with pytest.raises(ValueError):
        reg.alias_set("v2", "v1")  # may not shadow a version
    with pytest.raises(LookupError):
        reg.alias_delete("missing")


def test_delete_protected_while_aliased(reg):
    reg.alias_set("serving", "v2")
    with pytest.raises(PermissionError):
        reg.delete("v2")
    reg.alias_delete("serving")
    reg.delete("v2")
    assert reg.available() == ["v1"]


def test_dangling_alias_dropped(reg, tmp_path):
    _fake_index(reg.root, "v3")
    reg.alias_set("tmp", "v3")
    # out-of-band removal (not via reg.delete) leaves a dangling entry;
    # readers never see it
    import shutil

    shutil.rmtree(os.path.join(reg.root, "v3"))
    assert reg.aliases() == {}
    assert reg.resolve("tmp") == "tmp"  # unresolved name passes through
