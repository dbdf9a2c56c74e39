from .metrics import AverageMeter  # noqa: F401
