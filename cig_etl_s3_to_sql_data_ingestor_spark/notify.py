"""Run notifications (reference C4: `SlackNotifier.py`, `main.py:133-142,
181-193`): a summary message after an active run, a failure message with
the exception on a crashed run.

The transport is injectable: ``WebhookNotifier`` posts JSON to an
incoming-webhook URL (the reference's Slack pattern) via urllib — no
extra dependency — and ``CollectingNotifier`` records messages for tests
and for embedding the engine in a host app's own alerting.
"""

from __future__ import annotations

import json
import urllib.request


class Notifier:
    def send(self, message: str) -> None:  # pragma: no cover - interface
        raise NotImplementedError


class WebhookNotifier(Notifier):
    """POST {"text": message} to an incoming-webhook URL."""

    def __init__(self, url: str, timeout: float = 10.0):
        self.url = url
        self.timeout = timeout

    def send(self, message: str) -> None:
        req = urllib.request.Request(
            self.url,
            data=json.dumps({"text": message}).encode("utf-8"),
            headers={"Content-Type": "application/json"},
        )
        urllib.request.urlopen(req, timeout=self.timeout)  # noqa: S310


class CollectingNotifier(Notifier):
    """In-memory sink for tests / host-app integration."""

    def __init__(self):
        self.messages: list[str] = []

    def send(self, message: str) -> None:
        self.messages.append(message)
