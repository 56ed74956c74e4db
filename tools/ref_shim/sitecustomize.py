import importlib.metadata as _md
_orig = _md.version
def version(name):
    if name == "torchvision":
        return "0.17.2"
    return _orig(name)
_md.version = version
