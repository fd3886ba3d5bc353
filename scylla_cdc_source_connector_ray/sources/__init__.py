from . import events_adapter, synthetic  # noqa: F401
