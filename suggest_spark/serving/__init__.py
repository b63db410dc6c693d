"""HTTP serving layer: a thin WSGI front door over SuggestService."""

from .http_api import create_app, service_from_config  # noqa: F401
