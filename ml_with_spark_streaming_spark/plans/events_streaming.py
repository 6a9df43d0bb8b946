"""Event-time windowing queries (tumbling/sliding/session) and the
Structured-Streaming watermark query (see streaming/)."""

from __future__ import annotations
