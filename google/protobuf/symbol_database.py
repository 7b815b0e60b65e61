"""Symbol database (mini-runtime): generated modules only fetch the
default instance; message registration happens in internal.builder."""


class SymbolDatabase:
    pass


_default = SymbolDatabase()


def Default() -> SymbolDatabase:
    return _default
