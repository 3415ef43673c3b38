from . import attention, initializers, nn  # noqa: F401
