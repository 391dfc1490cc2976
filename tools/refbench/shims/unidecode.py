# Import-resolution stand-in for `unidecode` (not used by the
# measured stages). Fails loudly if called.
def unidecode(s):
    raise NotImplementedError('unidecode is outside the measured stages')
