"""Multi-table file catalog: namespaces + table directory over any accessor.

Moonlink's Iceberg catalog is filesystem/object-store backed — namespaces are
prefixes, tables live at ``<root>/<namespace>/<table>/`` with version-hint
metadata, and the catalog operations are pure accessor IO (reference:
src/moonlink/src/storage/iceberg/file_catalog.rs:372-810 —
list_namespaces / create_namespace / drop_namespace / list_tables /
create_table / load_table / drop_table / table_exists / register_table;
rename_table is left unsupported there at :690-693, implemented here as an
O(1) pointer move since names resolve through pointers anyway).

Layout under the catalog root:

- ``<root>/<ns>/.namespace`` — namespace marker object (object stores have
  no real directories; the reference writes an indicator object the same
  way, file_catalog.rs:443-480)
- ``<root>/<ns>/<table>/metadata/...`` — an in-place table (created by
  ``create_table``)
- ``<root>/<ns>/<table>/.pointer`` — a registered table whose real location
  is elsewhere (``register_table`` adopts existing tables by reference;
  ``rename_table`` moves names without moving bytes)

Everything routes through ``accessor_for`` — the catalog works identically
over local fs, ``mem://`` object store, and pyarrow.fs-backed schemes.
"""

from __future__ import annotations

import os

from pyspark.sql.types import StructType

from moonlink_spark.table import catalog as _cat
from moonlink_spark.table.catalog import Table
from moonlink_spark.table.io import accessor_for

NS_MARKER = ".namespace"
POINTER = ".pointer"
#: an in-place table renamed away: its BYTES stay under the old directory
#: (reachable through the new pointer) but the old NAME no longer resolves
TOMBSTONE = ".renamed"


class CatalogError(Exception):
    pass


class NoSuchNamespace(CatalogError):
    pass


class NoSuchTable(CatalogError):
    pass


class AlreadyExists(CatalogError):
    pass


def _valid_part(name: str) -> str:
    if not name or "/" in name or name.startswith("."):
        raise CatalogError(f"invalid namespace/table name {name!r}")
    return name


class FileCatalog:
    """A catalog rooted at one URI; all state lives in storage, so any
    number of processes can share it (commits stay safe through each
    table's own metadata CAS — the catalog adds no second lock)."""

    def __init__(self, root: str, data_root: str | None = None):
        self.root = root.rstrip("/")
        # for metadata stores Spark can't read (mem://), table DATA lands
        # under a parallel readable root — same split as create_table's
        # data_location (storage_config.rs:15-43 keeps the same two roots)
        self.data_root = data_root.rstrip("/") if data_root else None
        self.acc = accessor_for(self.root)

    # ------------------------------------------------------------ namespaces
    def _ns_dir(self, ns: str) -> str:
        return os.path.join(self.root, _valid_part(ns))

    def create_namespace(self, ns: str) -> None:
        marker = os.path.join(self._ns_dir(ns), NS_MARKER)
        if self.acc.exists(marker):
            raise AlreadyExists(f"namespace {ns!r} exists")
        self.acc.mkdirs(self._ns_dir(ns))
        self.acc.write_atomic(marker, "")

    def namespace_exists(self, ns: str) -> bool:
        return self.acc.exists(os.path.join(self._ns_dir(ns), NS_MARKER))

    def list_namespaces(self) -> list[str]:
        out = []
        for p in self.acc.list(self.root, suffix=NS_MARKER):
            rel = p[len(self.root) :].strip("/")
            parts = rel.split("/")
            if len(parts) == 2 and parts[1] == NS_MARKER:
                out.append(parts[0])
        return sorted(out)

    def drop_namespace(self, ns: str) -> None:
        """Refuses unless empty — file_catalog.rs:512-527 checks the same.
        "Empty" means no OBJECTS besides the marker, not just no table
        names: a renamed-away in-place table still stores its bytes under
        this prefix, and deleting them would destroy the renamed table."""
        if not self.namespace_exists(ns):
            raise NoSuchNamespace(ns)
        nsd = self._ns_dir(ns)
        marker = os.path.join(nsd, NS_MARKER)
        if [p for p in self.acc.list(nsd) if p != marker]:
            raise CatalogError(f"namespace {ns!r} is not empty")
        self.acc.delete(marker)
        self.acc.delete_prefix(nsd)

    # ---------------------------------------------------------------- tables
    def _table_dir(self, ns: str, name: str) -> str:
        return os.path.join(self._ns_dir(ns), _valid_part(name))

    def _require_ns(self, ns: str) -> None:
        if not self.namespace_exists(ns):
            raise NoSuchNamespace(ns)

    def table_exists(self, ns: str, name: str) -> bool:
        d = self._table_dir(ns, name)
        if self.acc.exists(os.path.join(d, POINTER)):
            return True
        if self.acc.exists(os.path.join(d, TOMBSTONE)):
            return False
        return self.acc.exists(os.path.join(d, "metadata", "version-hint.text"))

    def list_tables(self, ns: str) -> list[str]:
        self._require_ns(ns)
        nsd = self._ns_dir(ns)
        names, dead = set(), set()
        for p in self.acc.list(nsd, suffix=TOMBSTONE):
            dead.add(p[len(nsd) :].strip("/").split("/")[0])
        for suffix in ("version-hint.text", POINTER):
            for p in self.acc.list(nsd, suffix=suffix):
                rel = p[len(nsd) :].strip("/").split("/")
                # <table>/metadata/version-hint.text or <table>/.pointer
                if rel and not rel[0].startswith("."):
                    names.add(rel[0])
        # a pointer beats a tombstone in the SAME directory (re-created name)
        ptr_names = {
            p[len(nsd) :].strip("/").split("/")[0]
            for p in self.acc.list(nsd, suffix=POINTER)
        }
        return sorted(names - (dead - ptr_names))

    def create_table(
        self,
        ns: str,
        name: str,
        schema: StructType,
        properties: dict | None = None,
    ) -> Table:
        self._require_ns(ns)
        if self.table_exists(ns, name):
            raise AlreadyExists(f"table {ns}.{name} exists")
        if self.acc.exists(os.path.join(self._table_dir(ns, name), TOMBSTONE)):
            # the name was renamed away but its directory still stores the
            # renamed table's bytes — creating here would interleave two
            # tables in one prefix
            raise CatalogError(
                f"name {ns}.{name} is retired (renamed away; storage remains)"
            )
        data_location = (
            os.path.join(self.data_root, ns, name) if self.data_root else None
        )
        return _cat.create_table(
            self._table_dir(ns, name), schema,
            properties=properties, data_location=data_location,
        )

    def register_table(self, ns: str, name: str, location: str) -> Table:
        """Adopt an EXISTING table by reference — the catalog stores only a
        pointer; the table keeps committing at its own location
        (file_catalog.rs:780-789)."""
        self._require_ns(ns)
        if self.table_exists(ns, name):
            raise AlreadyExists(f"table {ns}.{name} exists")
        t = _cat.load_table(location)  # validates it IS a table
        d = self._table_dir(ns, name)
        self.acc.mkdirs(d)
        self.acc.write_atomic(os.path.join(d, POINTER), t.md.location)
        return t

    def load_table(self, ns: str, name: str) -> Table:
        d = self._table_dir(ns, name)
        ptr = os.path.join(d, POINTER)
        if self.acc.exists(ptr):
            return _cat.load_table(self.acc.read_text(ptr).strip())
        if self.table_exists(ns, name):
            return _cat.load_table(d)
        raise NoSuchTable(f"{ns}.{name}")

    def drop_table(self, ns: str, name: str, purge: bool = False) -> None:
        """Remove the catalog entry; ``purge`` additionally deletes every
        object under the table's own roots (data + metadata). A registered
        (pointer) table never purges the shared location unless asked —
        and an in-place table REQUIRES purge, because its entry and its
        bytes are the same prefix (the clone/GC ownership rule:
        operators/clone.py shares files by absolute reference, so blind
        deletion of a shared location is the one unrecoverable mistake)."""
        d = self._table_dir(ns, name)
        ptr = os.path.join(d, POINTER)
        if self.acc.exists(ptr):
            if purge:
                t = _cat.load_table(self.acc.read_text(ptr).strip())
                _purge_table(t)
            self.acc.delete(ptr)
            self.acc.delete_prefix(d)
            return
        if not self.table_exists(ns, name):
            raise NoSuchTable(f"{ns}.{name}")
        if not purge:
            raise CatalogError(
                f"{ns}.{name} is stored in-place; drop requires purge=True "
                "(or register it elsewhere first)"
            )
        t = _cat.load_table(d)
        _purge_table(t)
        self.acc.delete_prefix(d)

    def rename_table(self, ns: str, src: str, dst_ns: str, dst: str) -> None:
        """O(1) metadata move: the destination becomes a pointer to the
        table's (unmoved) location, then the source entry is removed.
        Data and metadata objects never move — names are indirection,
        the same reason the reference's absolute-path manifests make
        clones free (operators/clone.py)."""
        self._require_ns(dst_ns)
        if self.table_exists(dst_ns, dst):
            raise AlreadyExists(f"table {dst_ns}.{dst} exists")
        d = self._table_dir(ns, src)
        ptr = os.path.join(d, POINTER)
        if self.acc.exists(ptr):
            target = self.acc.read_text(ptr).strip()
        elif self.table_exists(ns, src):
            target = d
        else:
            raise NoSuchTable(f"{ns}.{src}")
        nd = self._table_dir(dst_ns, dst)
        self.acc.mkdirs(nd)
        self.acc.write_atomic(os.path.join(nd, POINTER), target)
        if self.acc.exists(ptr):
            self.acc.delete(ptr)
            self.acc.delete_prefix(d)
        else:
            # in-place source keeps its bytes where they are; only the NAME
            # moved — tombstone the old name so it stops resolving while the
            # directory remains the (pointer-reachable) storage location
            self.acc.write_atomic(os.path.join(d, TOMBSTONE), target)


def _purge_table(t: Table) -> None:
    """Delete every object under the table's metadata and data roots."""
    for root in {t.md.location, t.data_root}:
        acc = accessor_for(root)
        for p in acc.list(root):
            acc.delete(p)
        acc.delete_prefix(root)
