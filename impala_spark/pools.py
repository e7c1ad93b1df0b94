"""Request-pool resolution and admission control.

Re-implements the reference's RequestPoolService surface
(fe/src/main/java/org/apache/impala/util/RequestPoolService.java, tested by
fe/src/test/java/org/apache/impala/util/TestRequestPoolService.java) on
plain Python: the YARN fair-scheduler allocation file supplies the queue
tree, submit ACLs, placement rules, and per-queue memory caps; the
llama-site file supplies per-pool admission limits (max placed / max
queued reservations, queue timeout, default query options).

The placement-policy and ACL semantics follow the published Hadoop
FairScheduler behavior the reference delegates to
(AllocationFileLoaderService / QueuePlacementPolicy / AccessControlList):

- queue names are dot-joined from ``root`` (``root.queueA``); a requested
  name without the ``root.`` prefix is normalized by prepending it
- ``aclSubmitApps`` is ``"user1,user2 group1,group2"`` — the FIRST space
  splits users from groups; ``*`` in the user part admits everyone; a
  lone space admits nobody; an unconfigured queue defaults to ``*``
- access to a queue is granted if the queue's OWN acl or ANY ANCESTOR's
  acl admits the user (checked on the Kerberos short name)
- placement rules run in order: ``specified`` (skip when the requested
  queue is empty/``default``; with ``create="false"`` only assign names
  configured in the file), ``user`` (``root.<user>``), ``primaryGroup`` /
  ``secondaryGroupExistingQueue`` (OS group lookup), ``default``,
  ``reject`` (resolve to None); the default policy when the file has no
  ``<queuePlacementPolicy>`` is ``specified`` then ``user``

Config files are re-read when their mtime changes (the reference runs a
background file watcher with a check interval; here the check happens
lazily on access, which gives the same reload-after-edit behavior without
a thread).

Admission itself (``AdmissionController``) is the Spark-side design: the
per-pool memory cap is checked against the engine's planned input-bytes
estimate before execution, and ``max_requests``/``max_queued``/
``queue_timeout_ms`` gate concurrent statements through a counting
semaphore — on a 1000-executor cluster this is what stops one 100 TB scan
from starving every other tenant.
"""

from __future__ import annotations

import os
import re
import threading
import time
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field


MB = 1024 * 1024

# hardcoded defaults used when no llama-site file is given (the reference
# deliberately diverges from Llama's own defaults: unlimited running
# queries, 200 queued — RequestPoolService.java:86-104)
MAX_PLACED_DEFAULT = -1
MAX_QUEUED_DEFAULT = 200

MAX_PLACED_KEY = "llama.am.throttling.maximum.placed.reservations"
MAX_QUEUED_KEY = "llama.am.throttling.maximum.queued.reservations"
QUEUE_TIMEOUT_KEY = "impala.admission-control.pool-queue-timeout-ms"
QUERY_OPTIONS_KEY = "impala.admission-control.pool-default-query-options"


class PoolError(Exception):
    """Internal error while resolving a user to a pool."""


class AdmissionRejectedError(Exception):
    """Query rejected by admission control."""


def short_name(user: str) -> str:
    """Kerberos principal -> short name: 'u/host@REALM' -> 'u'."""
    return re.split(r"[/@]", user, 1)[0]


def _clean_queue_component(name: str) -> str:
    # YARN replaces '.' in user/group-derived components so the dot-joined
    # hierarchy stays unambiguous
    return name.replace(".", "_dot_")


def _user_groups(user: str) -> list[str]:
    """OS group lookup (primary first), like ShellBasedUnixGroupsMapping."""
    import grp
    import pwd

    try:
        pw = pwd.getpwnam(user)
    except KeyError:
        return []
    primary = grp.getgrgid(pw.pw_gid).gr_name
    secondary = [g.gr_name for g in grp.getgrall() if user in g.gr_mem and g.gr_name != primary]
    return [primary] + secondary


class _Acl:
    """aclSubmitApps semantics: 'users groups', '*' wildcard, ' ' nobody."""

    def __init__(self, text: str | None):
        if text is None:
            text = "*"  # unconfigured queue admits everyone
        parts = text.split(" ", 1)
        self.users = {u.strip() for u in parts[0].split(",") if u.strip()}
        self.groups = (
            {g.strip() for g in parts[1].split(",") if g.strip()} if len(parts) > 1 else set()
        )
        self.all = "*" in self.users or "*" in self.groups

    def allows(self, user: str) -> bool:
        if self.all:
            return True
        if user in self.users:
            return True
        if self.groups and any(g in self.groups for g in _user_groups(user)):
            return True
        return False


@dataclass
class PoolConfig:
    """Per-pool admission limits (mirrors TPoolConfig)."""

    max_requests: int = MAX_PLACED_DEFAULT
    max_queued: int = MAX_QUEUED_DEFAULT
    max_mem_resources: int = -1  # bytes; -1 = unlimited
    queue_timeout_ms: int | None = None
    default_query_options: str = ""


@dataclass
class ResolveResult:
    """Mirrors TResolveRequestPoolResult."""

    ok: bool
    resolved_pool: str | None = None
    has_access: bool | None = None
    error_msgs: list[str] = field(default_factory=list)


class AllocationConfig:
    """Parsed fair-scheduler allocation file: queues, ACLs, placement."""

    def __init__(self, path: str):
        root = ET.parse(path).getroot()
        #: full queue name -> (_Acl or None, max memory MB or None)
        self.queues: dict[str, tuple[_Acl | None, int | None]] = {}
        for q in root.findall("queue"):
            self._walk_queue(q, prefix="")
        self.rules: list[tuple[str, bool]] = []
        policy = root.find("queuePlacementPolicy")
        if policy is not None:
            for rule in policy.findall("rule"):
                name = rule.get("name", "")
                create = rule.get("create", "true").lower() != "false"
                self.rules.append((name, create))
        else:
            # FairScheduler default policy (user-as-default-queue=true):
            # specified, then user
            self.rules = [("specified", True), ("user", True)]

    def _walk_queue(self, el: ET.Element, prefix: str) -> None:
        name = el.get("name", "")
        full = f"{prefix}.{name}" if prefix else name
        acl_el = el.find("aclSubmitApps")
        acl = _Acl(acl_el.text if acl_el is not None else None) if acl_el is not None else None
        max_mb: int | None = None
        res_el = el.find("maxResources")
        if res_el is not None and res_el.text:
            m = re.search(r"(\d+)\s*mb", res_el.text, re.IGNORECASE)
            if m:
                max_mb = int(m.group(1))
        self.queues[full] = (acl, max_mb)
        for child in el.findall("queue"):
            self._walk_queue(child, prefix=full)

    # -- ACLs ---------------------------------------------------------------
    def has_access(self, pool: str, user: str) -> bool:
        """True if the queue's acl OR any ancestor's acl admits the user."""
        user = short_name(user)
        parts = pool.split(".")
        for i in range(len(parts), 0, -1):
            name = ".".join(parts[:i])
            acl, _ = self.queues.get(name, (None, None))
            if acl is None:
                acl = _Acl(None)  # unconfigured level defaults to '*'
            if acl.allows(user):
                return True
        return False

    def max_mem_bytes(self, pool: str) -> int:
        _, mb = self.queues.get(pool, (None, None))
        return -1 if mb is None else mb * MB

    # -- placement ----------------------------------------------------------
    def assign(self, requested_pool: str, user: str) -> str | None:
        """Run the placement rules; None means rejected."""
        user = short_name(user)
        requested = requested_pool or "default"
        for name, create in self.rules:
            if name == "specified":
                if requested and requested != "default":
                    full = requested if requested.startswith("root.") or requested == "root" else f"root.{requested}"
                    if create or full in self.queues:
                        return full
            elif name == "user":
                full = f"root.{_clean_queue_component(user)}"
                if create or full in self.queues:
                    return full
            elif name == "primaryGroup":
                groups = _user_groups(user)
                if not groups:
                    # IMPALA-922 error surface, pinned by
                    # TestRequestPoolService.testUserNoGroupsError
                    raise PoolError(
                        f"Failed to resolve user '{user}' to a pool while "
                        "evaluating the 'primaryGroup' or 'secondaryGroup' "
                        "queue placement rules because no groups were found "
                        "for the user. This is likely because the user does "
                        "not exist on the local operating system."
                    )
                full = f"root.{_clean_queue_component(groups[0])}"
                if create or full in self.queues:
                    return full
            elif name == "secondaryGroupExistingQueue":
                groups = _user_groups(user)
                if not groups:
                    raise PoolError(
                        f"Failed to resolve user '{user}' to a pool while "
                        "evaluating the 'primaryGroup' or 'secondaryGroup' "
                        "queue placement rules because no groups were found "
                        "for the user. This is likely because the user does "
                        "not exist on the local operating system."
                    )
                for g in groups[1:]:
                    full = f"root.{_clean_queue_component(g)}"
                    if full in self.queues:
                        return full
            elif name == "default":
                return "root.default"
            elif name == "reject":
                return None
            else:
                raise PoolError(f"Unknown queue placement rule: {name}")
        return None


class _LlamaConfig:
    """hadoop-style <configuration> property list."""

    def __init__(self, path: str):
        self.props: dict[str, str] = {}
        root = ET.parse(path).getroot()
        for prop in root.findall("property"):
            name_el = prop.find("name")
            val_el = prop.find("value")
            if name_el is not None and name_el.text:
                self.props[name_el.text.strip()] = (val_el.text or "").strip() if val_el is not None else ""

    def get_int(self, pool: str, key: str, default: int) -> int:
        # per-pool value first, then the file-level default, then 'default'
        # (RequestPoolService.getLlamaPoolConfigValue)
        for k in (f"{key}.{pool}", key):
            if k in self.props:
                try:
                    return int(self.props[k])
                except ValueError:
                    pass
        return default

    def get_str(self, pool: str, key: str, default: str) -> str:
        for k in (f"{key}.{pool}", key):
            if k in self.props:
                return self.props[k]
        return default


class _WatchedFile:
    """Lazily re-parsed config file: reload when mtime changes."""

    def __init__(self, path: str | None, parser):
        self.path = path
        self._parser = parser
        self._mtime: float | None = None
        self._value = None

    def get(self):
        if self.path is None:
            return None
        mtime = os.stat(self.path).st_mtime
        if self._mtime is None or mtime != self._mtime:
            self._value = self._parser(self.path)
            self._mtime = mtime
        return self._value


class RequestPoolService:
    """User→pool resolution + per-pool config (RequestPoolService.java)."""

    def __init__(self, allocation_file: str, llama_site_file: str | None = None):
        self._alloc = _WatchedFile(allocation_file, AllocationConfig)
        self._llama = _WatchedFile(llama_site_file, _LlamaConfig)
        self._alloc.get()  # fail fast on unparsable config
        if llama_site_file is not None:
            self._llama.get()

    def assign_to_pool(self, requested_pool: str, user: str) -> str | None:
        if not user:
            raise ValueError("user must not be empty")
        return self._alloc.get().assign(requested_pool, user)

    def has_access(self, pool: str, user: str) -> bool:
        if not pool or not user:
            raise ValueError("pool and user must not be empty")
        return self._alloc.get().has_access(pool, user)

    def get_pool_config(self, pool: str) -> PoolConfig:
        cfg = PoolConfig(max_mem_resources=self._alloc.get().max_mem_bytes(pool))
        llama = self._llama.get()
        if llama is None:
            return cfg
        cfg.max_requests = llama.get_int(pool, MAX_PLACED_KEY, MAX_PLACED_DEFAULT)
        cfg.max_queued = llama.get_int(pool, MAX_QUEUED_KEY, MAX_QUEUED_DEFAULT)
        timeout = llama.get_int(pool, QUEUE_TIMEOUT_KEY, -1)
        if timeout > 0:
            cfg.queue_timeout_ms = timeout
        cfg.default_query_options = llama.get_str(pool, QUERY_OPTIONS_KEY, "")
        return cfg

    def resolve_request_pool(self, user: str, requested_pool: str) -> ResolveResult:
        """TResolveRequestPoolParams -> TResolveRequestPoolResult."""
        try:
            pool = self.assign_to_pool(requested_pool, user)
        except PoolError as e:
            return ResolveResult(ok=False, error_msgs=[str(e)])
        if pool is None:
            # not an error: the policy rejected the placement
            return ResolveResult(ok=True)
        return ResolveResult(ok=True, resolved_pool=pool, has_access=self.has_access(pool, user))


class AdmissionController:
    """Per-pool concurrency + memory admission over a RequestPoolService.

    ``admit(pool, user, estimate_bytes)`` either returns an admission
    token (call ``release()`` when the statement finishes) or raises
    AdmissionRejectedError. Requests over ``max_requests`` wait in the
    queue up to ``queue_timeout_ms`` (default 60 s like the reference);
    the queue itself is bounded by ``max_queued``.
    """

    DEFAULT_QUEUE_TIMEOUT_MS = 60_000

    def __init__(self, pool_service: RequestPoolService):
        self.pools = pool_service
        self._lock = threading.Condition()
        self._running: dict[str, int] = {}
        self._queued: dict[str, int] = {}

    class _Token:
        def __init__(self, ctrl: "AdmissionController", pool: str):
            self._ctrl, self.pool = ctrl, pool
            self._released = False

        def release(self) -> None:
            if not self._released:
                self._released = True
                self._ctrl._release(self.pool)

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            self.release()

    def admit(self, pool: str, user: str, estimate_bytes: int = 0) -> "AdmissionController._Token":
        if not self.pools.has_access(pool, user):
            raise AdmissionRejectedError(
                f"Rejected query from pool {pool}: user '{short_name(user)}' "
                f"does not have permission to submit to pool {pool}"
            )
        cfg = self.pools.get_pool_config(pool)
        if cfg.max_mem_resources >= 0 and estimate_bytes > cfg.max_mem_resources:
            raise AdmissionRejectedError(
                f"Rejected query from pool {pool}: request memory estimate "
                f"{estimate_bytes} is greater than pool max mem resources "
                f"{cfg.max_mem_resources}"
            )
        timeout_s = (cfg.queue_timeout_ms or self.DEFAULT_QUEUE_TIMEOUT_MS) / 1000.0
        deadline = time.monotonic() + timeout_s
        with self._lock:
            if cfg.max_requests < 0 or self._running.get(pool, 0) < cfg.max_requests:
                self._running[pool] = self._running.get(pool, 0) + 1
                return self._Token(self, pool)
            if self._queued.get(pool, 0) >= cfg.max_queued:
                raise AdmissionRejectedError(
                    f"Rejected query from pool {pool}: queue full, limit="
                    f"{cfg.max_queued}, num_queued={self._queued.get(pool, 0)}"
                )
            self._queued[pool] = self._queued.get(pool, 0) + 1
            try:
                while self._running.get(pool, 0) >= cfg.max_requests:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0 or not self._lock.wait(remaining):
                        raise AdmissionRejectedError(
                            f"Admission for query exceeded timeout "
                            f"{int(timeout_s * 1000)}ms in pool {pool}"
                        )
                self._running[pool] = self._running.get(pool, 0) + 1
                return self._Token(self, pool)
            finally:
                self._queued[pool] -= 1

    def _release(self, pool: str) -> None:
        with self._lock:
            self._running[pool] = max(0, self._running.get(pool, 0) - 1)
            self._lock.notify_all()
