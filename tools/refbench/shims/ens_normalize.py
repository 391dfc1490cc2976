# Import-resolution stand-in for `ens_normalize` (not used by the
# measured stages). Fails loudly if called.
class DisallowedNameError(Exception):
    pass


def ens_cure(name):
    raise NotImplementedError('ens_cure is outside the measured stages')
