"""dot.notation dict (reference parity: vae/utils.py:3-7, spair/utils.py:7-11).

The typed dataclass configs (core/config.py) are the first-class config
mechanism; this shim exists so user code written against the reference's
config object keeps working — including the reference's load-bearing quirk
that missing keys read as None instead of raising.
"""


class dotdict(dict):
    """dot.notation access to dictionary attributes; missing keys -> None."""

    __getattr__ = dict.get
    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__
