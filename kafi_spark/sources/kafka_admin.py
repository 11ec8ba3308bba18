"""Kafka cluster admin plane: ACLs, brokers, configs, delete_records, groups.

Mirrors the reference's ClusterAdmin surface (kafi/kafka/cluster/
cluster_admin.py:22-120,292-327) as request normalization over a
pluggable transport. No Kafka client library ships in this environment,
so the default transport raises a documented error; everything the
reference layers on top of confluent_kafka's AdminClient — acl dict
validation and filter defaulting, pattern→partition fan-out for
delete_records, glob filtering of brokers/groups, incremental config
updates with validate_only — lives here and is unit-tested against a
fake transport that records the constructed requests.

Transport contract: ``transport(request: dict) -> response`` where
``request["op"]`` names the admin call and the remaining keys are the
normalized arguments (exact shapes below per method). Plugging in a real
client is one dispatch function, e.g. mapping ``describe_acls`` to
``AdminClient.describe_acls(AclBindingFilter(...))``.
"""

from __future__ import annotations

from collections.abc import Callable
from fnmatch import fnmatch

#: Kafka sentinel: truncate to the high watermark (reference OFFSET_END)
OFFSET_END = -1

_RESOURCE_TYPES = {"unknown", "any", "topic", "group", "broker", "transactional_id"}
_PATTERN_TYPES = {"unknown", "any", "match", "literal", "prefixed"}
_OPERATIONS = {
    "unknown", "any", "all", "read", "write", "create", "delete", "alter",
    "describe", "cluster_action", "describe_configs", "alter_configs",
    "idempotent_write",
}
_PERMISSION_TYPES = {"unknown", "any", "deny", "allow"}

_ACL_FIELDS = {
    "resource_type": _RESOURCE_TYPES,
    "pattern_type": _PATTERN_TYPES,
    "operation": _OPERATIONS,
    "permission_type": _PERMISSION_TYPES,
}


def _no_transport(request: dict):
    raise NotImplementedError(
        "no Kafka admin transport configured (no kafka client library in "
        "this environment); pass transport= mapping request dicts to a "
        f"real AdminClient — got request {request.get('op')!r}"
    )


def normalize_acl(acl: dict, for_filter: bool = False) -> dict:
    """Validate and default an acl dict (reference acl_dict_to_aclBinding /
    _to_aclBindingFilter, cluster_admin.py:449-467,559-577): enum fields
    checked against the public AdminClient vocabularies; filters default
    missing enums to ``any`` and missing principal/host/name to None,
    while bindings require every field."""
    out = {}
    for field, vocab in _ACL_FIELDS.items():
        v = acl.get(field)
        if v is None:
            if not for_filter:
                raise ValueError(f"acl binding requires {field!r}")
            v = "any"
        if v not in vocab:
            raise ValueError(f"unsupported {field}: {v!r} (one of {sorted(vocab)})")
        out[field] = v
    for field in ("name", "principal", "host"):
        v = acl.get(field)
        if v is None and not for_filter:
            raise ValueError(f"acl binding requires {field!r}")
        out[field] = v
    return out


class KafkaClusterAdmin:
    """The reference's cluster admin verbs over a transport callable."""

    def __init__(self, transport: Callable[[dict], object] | None = None):
        self.transport = transport or _no_transport

    # -- ACLs (cluster_admin.py:22-41) --------------------------------------

    def acls(self, acl: dict | None = None) -> list[dict]:
        return self.transport(
            {"op": "describe_acls", "filter": normalize_acl(acl or {}, for_filter=True)}
        )

    def create_acl(self, acl: dict) -> dict:
        binding = normalize_acl(acl)
        self.transport({"op": "create_acls", "acls": [binding]})
        return binding

    def delete_acls(self, acl: dict) -> list[dict]:
        return self.transport(
            {"op": "delete_acls", "filter": normalize_acl(acl, for_filter=True)}
        )

    # -- brokers (cluster_admin.py:45-69) -----------------------------------

    def brokers(self, pattern=None) -> dict[int, str]:
        """Broker id -> host:port, filtered by glob over the id (the
        reference's int-or-str-or-list pattern convention)."""
        pats = pattern if isinstance(pattern, list) else [pattern]
        pat_strs = ["*"] if pats == [None] else [str(p) for p in pats]
        all_brokers = self.transport({"op": "list_brokers"})
        return {
            bid: addr for bid, addr in all_brokers.items()
            if any(fnmatch(str(bid), p) for p in pat_strs)
        }

    def broker_config(self, pattern=None, config: dict | None = None,
                      test: bool = False) -> dict[int, dict]:
        """Get (and optionally incrementally set) broker configs
        (cluster_admin.py:57-69). ``test=True`` maps to validate_only."""
        broker_ids = list(self.brokers(pattern))
        if config is not None:
            for bid in broker_ids:
                self.transport({
                    "op": "alter_config", "resource_type": "broker",
                    "resource": str(bid),
                    "config": {k: str(v) for k, v in config.items()},
                    "incremental": True, "validate_only": test,
                })
        return {
            bid: self.transport({
                "op": "describe_config", "resource_type": "broker",
                "resource": str(bid),
            })
            for bid in broker_ids
        }

    def topic_config(self, topic: str, config: dict | None = None,
                     test: bool = False) -> dict:
        """Topic-level analogue (reference get/set_resource_config_dict,
        cluster_admin.py:72-91)."""
        if config is not None:
            self.transport({
                "op": "alter_config", "resource_type": "topic",
                "resource": topic,
                "config": {k: str(v) for k, v in config.items()},
                "incremental": True, "validate_only": test,
            })
        return self.transport({
            "op": "describe_config", "resource_type": "topic", "resource": topic,
        })

    # -- delete_records (cluster_admin.py:292-315) --------------------------

    def delete_records(self, pattern_or_offsets) -> list[tuple[str, int, int]]:
        """Build the (topic, partition, cut-offset) list: dict form passes
        through; pattern form fans out to every partition at OFFSET_END,
        resolving topics/partitions through the transport."""
        if isinstance(pattern_or_offsets, dict):
            tps = [
                (topic, int(p), int(o))
                for topic, offs in pattern_or_offsets.items()
                for p, o in offs.items()
            ]
        else:
            topics = self.transport(
                {"op": "list_topics", "pattern": pattern_or_offsets})
            tps = [
                (t, p, OFFSET_END)
                for t in topics
                for p in range(self.transport({"op": "partitions", "topic": t}))
            ]
        self.transport({"op": "delete_records", "offsets": tps})
        return tps

    # -- groups (cluster_admin.py:94-120) -----------------------------------

    def groups(self, pattern="*", state_pattern="*", state: bool = False):
        pats = [pattern] if isinstance(pattern, str) else pattern
        spats = [state_pattern] if isinstance(state_pattern, str) else state_pattern
        listing = self.transport({"op": "list_groups"})  # {group: state}
        matched = {
            g: s for g, s in listing.items()
            if any(fnmatch(g, p) for p in pats)
            and any(fnmatch(s, sp) for sp in spats)
        }
        return matched if state else list(matched)

    def describe_groups(self, pattern="*", state_pattern="*") -> dict:
        names = self.groups(pattern, state_pattern)
        if not names:
            return {}
        return self.transport({"op": "describe_groups", "groups": names})

    def delete_groups(self, pattern, state_pattern="*") -> list[str]:
        names = self.groups(pattern, state_pattern)
        if not names:
            return []
        self.transport({"op": "delete_groups", "groups": names})
        return names
