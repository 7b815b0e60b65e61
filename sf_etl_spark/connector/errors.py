"""Typed connector errors.

Mirrors the reference's source-chained error enum
(`oxidized-force/src/errors.rs:3-27`: Deserialize / Builder /
NotAuthenticated / Token / Response / Http / Header variants) as an
exception hierarchy, which is the idiomatic Python equivalent of a
Rust error enum.
"""

from __future__ import annotations


class ConnectorError(Exception):
    """Base class for every connector failure."""


class ClientBuilderError(ConnectorError):
    """Required client configuration missing (``errors.rs:8-9``)."""


class NotAuthenticatedError(ConnectorError):
    """An API call was made before ``login`` (``errors.rs:12-13``)."""


class TokenError(ConnectorError):
    """The OAuth token endpoint rejected the credentials
    (``errors.rs:14-15``, raised at ``client.rs:185-186``)."""


class ResponseError(ConnectorError):
    """The API returned a non-success status with an error payload
    (``errors.rs:17-18``; wire shape ``response.rs:88-94``)."""

    def __init__(self, status: int, error_code: str | None, message: str):
        super().__init__(f"[{status}] {error_code}: {message}")
        self.status = status
        self.error_code = error_code
        self.message = message


class HttpError(ConnectorError):
    """Transport-level failure after retries (``errors.rs:20-21``)."""


class JobFailedError(ConnectorError):
    """A bulk extract job reached the ``Failed`` terminal state."""


class IngestBudgetError(ConnectorError):
    """A write task hit its runtime job-count budget
    (``max_jobs_per_task``) mid-flight — a governance stop, distinct
    from construction-time option validation (ClientBuilderError):
    real jobs were already opened (and aborted) when this raises."""
