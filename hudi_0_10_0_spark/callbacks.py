"""Write-commit callbacks: notify an external system after every
successful *user write* commit.

Reference: ``client/callback/HoodieWriteCommitCallback.java`` (SPI),
``client/callback/common/HoodieWriteCommitCallbackMessage.java``
(message = commitTime + tableName + basePath + writeStats),
``client/callback/impl/HoodieWriteCommitHttpCallback.java`` +
``client/callback/client/http/HoodieWriteCommitHttpCallbackClient.java``
(HTTP POST of the JSON message with a ``HUDI-CALLBACK-KEY`` header;
network failures and non-2xx responses are logged, never raised), fired
from ``client/client/AbstractHoodieWriteClient.java:209-213`` on
``commitStats`` — i.e. on user write commits, NOT on table-service
commits (compaction/clustering/clean).

The Kafka variant (``callback/impl/kafka``) needs a Kafka client the
sandbox doesn't ship; the SPI below is the seam a Kafka implementation
would plug into (same boundary as ``streaming/delta_streamer.py``'s
Kafka source).
"""

from __future__ import annotations

import dataclasses
import json
import logging
from typing import Callable

log = logging.getLogger(__name__)

# Header name the reference HTTP client sends the api key under
# (HoodieWriteCommitHttpCallbackClient.java HEADER_KEY_API_KEY).
HTTP_API_KEY_HEADER = "HUDI-CALLBACK-KEY"


@dataclasses.dataclass
class WriteCommitCallbackMessage:
    """``HoodieWriteCommitCallbackMessage.java``: one successful batch
    write. ``write_stats`` is the commit metadata's per-file-group stat
    dicts (partition, file_id, paths, rows, bytes)."""

    commit_time: str
    table_name: str
    base_path: str
    write_stats: list[dict]
    action: str = "commit"  # commit | deltacommit | replacecommit

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), sort_keys=True)


class WriteCommitCallback:
    """SPI (``HoodieWriteCommitCallback.java``): implement ``call``.

    ``call`` runs AFTER the commit is durable on the timeline; raising
    from it surfaces to the writer but cannot undo the commit (matching
    the reference, where the callback fires inside ``commitStats`` after
    the instant transitions to completed).
    """

    def call(self, message: WriteCommitCallbackMessage) -> None:
        raise NotImplementedError


class HttpWriteCommitCallback(WriteCommitCallback):
    """POST the message JSON to a URL. Failures (connection errors,
    non-2xx) are WARN-logged, never raised — the reference client
    behaves the same, so a dead callback endpoint can't fail writes."""

    def __init__(self, url: str, api_key: str = "", timeout_seconds: float = 3.0):
        if not url:
            raise ValueError(
                "write_commit_callback_http_url is required for the http callback"
            )
        self.url = url
        self.api_key = api_key
        self.timeout_seconds = timeout_seconds

    def call(self, message: WriteCommitCallbackMessage) -> None:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            self.url,
            data=message.to_json().encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                HTTP_API_KEY_HEADER: self.api_key,
            },
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_seconds) as resp:
                if resp.status >= 300:
                    log.warning(
                        "commit callback POST %s returned %s", self.url, resp.status
                    )
        except urllib.error.HTTPError as e:  # non-2xx raises here
            log.warning("commit callback POST %s returned %s", self.url, e.code)
        except Exception as e:  # connection refused, timeout, DNS ...
            log.warning("failed to send commit callback to %s: %s", self.url, e)


# Name → factory(cfg) registry. "http" is built in; tests and users
# register their own (the reference resolves a class name via
# reflection — a registry is the Python-native equivalent, and a dotted
# "module:Class" path is accepted too for parity with
# hoodie.write.commit.callback.class).
_FACTORIES: dict[str, Callable] = {}


def register_callback_factory(name: str, factory: Callable) -> None:
    """``factory(cfg) -> WriteCommitCallback`` (or any object with
    ``call``)."""
    _FACTORIES[name] = factory


register_callback_factory(
    "http",
    lambda cfg: HttpWriteCommitCallback(
        cfg.write_commit_callback_http_url or "",
        cfg.write_commit_callback_http_api_key,
        cfg.write_commit_callback_http_timeout_seconds,
    ),
)


def create_callback(cfg):
    """``HoodieCommitCallbackFactory.create``: resolve the configured
    callback. Accepts a registered name or a dotted ``module:Class``
    path whose class takes no constructor args."""
    name = cfg.write_commit_callback_class
    if name in _FACTORIES:
        return _FACTORIES[name](cfg)
    if ":" in name:
        import importlib

        mod, _, cls = name.partition(":")
        return getattr(importlib.import_module(mod), cls)()
    raise ValueError(
        f"unknown write_commit_callback_class {name!r}; registered: "
        f"{sorted(_FACTORIES)}"
    )


def validate_callback_config(cfg) -> None:
    """Fail fast BEFORE any data is written: a misconfigured callback
    (unknown class, http with no URL) would otherwise surface only
    after the commit is durable, making the write look failed and
    inviting a duplicate-data retry (code-review r7). Resolving the
    callback once up front costs nothing and pins the config."""
    if getattr(cfg, "write_commit_callback_on", False):
        create_callback(cfg)


def fire_commit_callback(table, instant: str, action: str, metadata: dict) -> None:
    """Called by the write paths right after a successful
    ``guarded_commit``. No-op unless ``write_commit_callback_on``."""
    cfg = table.cfg
    if not getattr(cfg, "write_commit_callback_on", False):
        return
    cb = create_callback(cfg)
    cb.call(
        WriteCommitCallbackMessage(
            commit_time=instant,
            table_name=cfg.table_name,
            base_path=table.base_path,
            write_stats=list(metadata.get("write_stats", [])),
            action=action,
        )
    )
