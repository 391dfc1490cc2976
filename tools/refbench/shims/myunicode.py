# Import-resolution stand-in for `myunicode` (NameHash's unicode lib;
# not used by the measured stages). Fails loudly if touched.
def __getattr__(name):
    raise NotImplementedError(f'myunicode.{name} is outside the measured stages')
