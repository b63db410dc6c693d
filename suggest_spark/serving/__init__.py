"""HTTP serving layer: a thin WSGI front door over SuggestService."""

from .coalesce import RequestCoalescer  # noqa: F401
from .http_api import create_app, service_from_config  # noqa: F401
