def profile(*a, **k):
    return 0.0, 0.0
