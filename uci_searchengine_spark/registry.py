"""Multi-index version management: the reference's database-switch
surface (backend/app/api/routes.py:62-130, connection.py:36-135) over
named index directories.

The reference keeps several SQLite files and swaps the active one behind
a session factory; the analog here is a ROOT directory of built indexes
(each a `build_index` output with its own meta.json/manifests) and a
``CURRENT`` pointer file updated by rename-commit — the same atomic-
pointer pattern as Lucene's segments_N / Iceberg's version-hint. Readers
that loaded the old index keep serving it (directories are immutable
once built); a switch only changes what NEW loads resolve, so the swap
is safe under concurrent queries.

"Upload" in the reference is receiving a .sqlite file; the analog is
registering an index directory that was built elsewhere (`add`) — at
cluster scale an index is a directory tree on shared storage, not a
file you POST.
"""

from __future__ import annotations

import json
import os
import shutil


class IndexRegistry:
    """Named index versions under one root + an atomic CURRENT pointer."""

    def __init__(self, root: str, default: str | None = None):
        self.root = root
        self.default = default
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- queries
    def available(self) -> list[str]:
        out = []
        for name in sorted(os.listdir(self.root)):
            if os.path.isfile(os.path.join(self.root, name, "meta.json")):
                out.append(name)
        return out

    def current(self) -> str | None:
        try:
            with open(os.path.join(self.root, "CURRENT")) as f:
                name = f.read().strip()
        except OSError:
            name = None
        if name and name in self.available():
            return name
        avail = self.available()
        if self.default and self.default in avail:
            return self.default
        return avail[0] if avail else None

    def path(self, name: str | None = None) -> str:
        name = self.resolve(name)
        if name is None:
            raise LookupError("registry has no indexes")
        p = os.path.join(self.root, name)
        if not os.path.isfile(os.path.join(p, "meta.json")):
            raise LookupError(f"no such index: {name}")
        return p

    # ------------------------------------------------------------ mutation
    def switch(self, name: str) -> None:
        name = self.resolve(name)
        if name not in self.available():
            raise LookupError(f"no such index: {name}")
        tmp = os.path.join(self.root, "CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(name)
        os.replace(tmp, os.path.join(self.root, "CURRENT"))

    def add(self, name: str, src_dir: str, move: bool = False) -> None:
        """Register a built index directory under ``name`` (upload analog).
        Copies (or moves) into the root; rejects name collisions and
        directories that aren't a committed index."""
        if name in self.available():
            raise FileExistsError(f"index already registered: {name}")
        if not os.path.isfile(os.path.join(src_dir, "meta.json")):
            raise ValueError(f"not a built index (no meta.json): {src_dir}")
        dst = os.path.join(self.root, name)
        if move:
            shutil.move(src_dir, dst)
        else:
            shutil.copytree(src_dir, dst)

    def delete(self, name: str) -> None:
        """Refuses the current and the default index (routes.py:106-110),
        and any version an alias still points to (ES parity: you must
        repoint or drop the alias first)."""
        if name not in self.available():
            raise LookupError(f"no such index: {name}")
        if name == self.current():
            raise PermissionError("cannot delete current index")
        if self.default and name == self.default:
            raise PermissionError("cannot delete default index")
        holders = [a for a, v in self.aliases().items() if v == name]
        if holders:
            raise PermissionError(
                f"aliases still point at {name}: {sorted(holders)}"
            )
        shutil.rmtree(os.path.join(self.root, name))

    # ------------------------------------------------------------- aliases
    # ES index-alias analog: a stable public name over rotating versions.
    # Stored in one aliases.json committed by rename (same atomicity as
    # CURRENT); alias writes are O(aliases), never touch index bytes, and
    # a reader that resolved the old target keeps serving it (immutable
    # dirs) — alias swap IS the zero-downtime reindex cutover.
    def _aliases_path(self) -> str:
        return os.path.join(self.root, "aliases.json")

    def aliases(self) -> dict[str, str]:
        """{alias: version-name}; silently drops entries whose target
        no longer exists (deleted out-of-band)."""
        try:
            with open(self._aliases_path()) as f:
                raw = json.load(f)
        except (OSError, ValueError):
            return {}
        avail = set(self.available())
        return {a: v for a, v in raw.items() if v in avail}

    def alias_set(self, alias: str, name: str) -> None:
        """Create or REPOINT ``alias`` → ``name`` atomically (the ES
        actions=[remove+add] swap is a single committed write here).
        An alias may not shadow a real version name."""
        if name not in self.available():
            raise LookupError(f"no such index: {name}")
        if alias in self.available():
            raise ValueError(f"alias would shadow a version: {alias}")
        cur = self.aliases()
        cur[alias] = name
        tmp = self._aliases_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cur, f, indent=2, sort_keys=True)
        os.replace(tmp, self._aliases_path())

    def alias_delete(self, alias: str) -> None:
        cur = self.aliases()
        if alias not in cur:
            raise LookupError(f"no such alias: {alias}")
        del cur[alias]
        tmp = self._aliases_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cur, f, indent=2, sort_keys=True)
        os.replace(tmp, self._aliases_path())

    def resolve(self, name: str | None = None) -> str | None:
        """Alias-aware name resolution: an alias resolves to its target
        version; a version name (or None = CURRENT) passes through."""
        if name is None:
            return self.current()
        return self.aliases().get(name, name)
