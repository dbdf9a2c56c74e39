from . import nets, posenc, sh  # noqa: F401
