"""Configuration: CLI settings, credentials, credential stores."""

from openintel_tpu.config.secrets import Credentials  # noqa: F401
from openintel_tpu.config.settings import AppConfig, OutputFormat  # noqa: F401
from openintel_tpu.config.store import (  # noqa: F401
    CredentialStore,
    InMemoryStore,
    KeychainStore,
)
