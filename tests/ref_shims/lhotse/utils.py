def fastcopy(obj, **kwargs):
    raise NotImplementedError


def fix_random_seed(seed):
    import random
    import torch
    random.seed(seed)
    torch.manual_seed(seed)
