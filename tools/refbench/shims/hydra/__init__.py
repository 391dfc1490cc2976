# Import-resolution stand-in for `hydra` (config framework pulled in
# by prepare_members_names' import of the NameAI Inspector; the
# measured stages never configure it). Fails loudly if used.
def initialize_config_module(*args, **kwargs):
    raise NotImplementedError('hydra is outside the measured stages')


def compose(*args, **kwargs):
    raise NotImplementedError('hydra is outside the measured stages')
