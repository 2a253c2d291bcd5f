def fastcopy(obj, **kwargs):
    raise NotImplementedError
