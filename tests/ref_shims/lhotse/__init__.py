class CutSet:  # placeholder, never instantiated in parity tests
    pass
