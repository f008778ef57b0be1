"""Kind model: the reference's dynamic, inheritance-based schema registry.

Mirrors the semantics of reference schema_utils.py:39-63 and the
resotoclient Kind/Property shapes used throughout (conftest.py:23-64):

* ``kind_properties`` walks ``bases`` transitively with cycle
  protection, drops synthetic props and the ``kind`` prop (encoded in
  the table name), and appends the four denormalized ancestor columns
  ``cloud/account/region/zone`` ("carz") plus an optional ``_id``.
* On a property-name clash the BASE kind's property replaces the
  subclass's (reference schema_utils.py:53-55 assigns base props over
  the already-collected subclass props) — replicated bug-for-bug since
  golden rows depend on it.  Likewise a real property named after a
  carz column (e.g. ``zone``) DUPLICATES in the output: the reference
  appends carz unconditionally (``id_prop + prs + carz``,
  schema_utils.py:63) — pinned by tests/test_properties.py.
* Only kinds with ``aggregate_root=True``, no ``runtime_kind`` and not
  in ``base_kinds`` become tables (reference sql.py:166-170).  The
  reference derives ``base_kinds`` by reflection over
  resotolib.baseresources (schema_utils.py:13-15); we take it as a
  constructor argument with the conventional defaults.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

# Kinds that are abstract in the reference's resource hierarchy — no
# instances, hence no tables (reference schema_utils.py:13-15).
DEFAULT_BASE_KINDS = frozenset(
    {
        "resource",
        "graph_root",
        "cloud",
        "account",
        "region",
        "zone",
        "phantom_resource",
    }
)

TEMP_PREFIX = "tmp_"

CARZ = ("cloud", "account", "region", "zone")


@dataclass
class Property:
    name: str
    kind: str
    required: bool = False
    synthetic: Optional[dict[str, Any]] = None
    metadata: Optional[dict[str, Any]] = None


@dataclass
class Kind:
    fqn: str
    runtime_kind: Optional[str] = None
    properties: Optional[list[Property]] = None
    bases: Optional[list[str]] = None
    aggregate_root: bool = False
    successor_kinds: Optional[dict[str, list[str]]] = None


@dataclass
class Model:
    kinds: dict[str, Kind]
    base_kinds: frozenset[str] = field(default_factory=lambda: DEFAULT_BASE_KINDS)

    @staticmethod
    def from_json(kinds_json: list[dict[str, Any]], **kw: Any) -> "Model":
        """Build from the exported kind-model JSON
        (collector.graph.export_model shape, collect_plugins.py:116-117)."""
        kinds: dict[str, Kind] = {}
        for k in kinds_json:
            props = [
                Property(
                    name=p["name"],
                    kind=p["kind"],
                    required=p.get("required", False),
                    synthetic=p.get("synthetic"),
                    metadata=p.get("metadata"),
                )
                for p in (k.get("properties") or [])
            ]
            kinds[k["fqn"]] = Kind(
                fqn=k["fqn"],
                runtime_kind=k.get("runtime_kind"),
                properties=props,
                bases=k.get("bases"),
                aggregate_root=bool(k.get("aggregate_root")),
                successor_kinds=k.get("successor_kinds"),
            )
        return Model(kinds, **kw)

    def kind_properties(
        self, kind: Kind, with_id: bool = False
    ) -> tuple[list[Property], list[str]]:
        """Flattened (inherited) properties + default successor kinds —
        reference schema_utils.py:39-63 semantics exactly."""
        visited: set[str] = set()

        def walk(kd: Kind) -> tuple[dict[str, Property], list[str]]:
            if kd.fqn in visited:
                return {}, []
            visited.add(kd.fqn)
            properties: dict[str, Property] = {
                p.name: p
                for p in (kd.properties or [])
                if p.synthetic is None and p.name != "kind"
            }
            defaults = (kd.successor_kinds or {}).get("default")
            successors: list[str] = list(defaults) if defaults else []
            for base_name in kd.bases or []:
                if base := self.kinds.get(base_name):
                    props, succs = walk(base)
                    for p in props.values():
                        properties[p.name] = p  # base wins, as in reference
                    successors.extend(succs)
            return properties, successors

        props, succs = walk(kind)
        id_prop = [Property("_id", "string", True)] if with_id else []
        carz = [Property(c, "string") for c in CARZ]
        return id_prop + list(props.values()) + carz, succs

    def table_kinds(self) -> list[Kind]:
        """Kinds that materialize as tables (reference sql.py:166-170)."""
        return [
            k
            for k in self.kinds.values()
            if k.aggregate_root
            and k.runtime_kind is None
            and k.fqn not in self.base_kinds
        ]


def get_table_name(kind: str, with_tmp_prefix: bool = False) -> str:
    """kind -> table/view name (reference schema_utils.py:28-30)."""
    replaced = kind.replace(".", "_")
    return TEMP_PREFIX + replaced if with_tmp_prefix else replaced


def get_link_table_name(
    from_kind: str, to_kind: str, with_tmp_prefix: bool = False
) -> str:
    """Link table naming with the 25-char truncation for Postgres's
    63-char identifier limit (reference schema_utils.py:33-36)."""
    name = (
        f"link_{get_table_name(from_kind)[0:25]}_{get_table_name(to_kind)[0:25]}"
    )
    return TEMP_PREFIX + name if with_tmp_prefix else name
