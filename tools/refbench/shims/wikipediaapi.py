# Import-resolution stand-in for `wikipediaapi` (HTTP transport; the
# measured stages never call it). Any actual use fails loudly.
class ExtractFormat:
    WIKI = 'wiki'


class Namespace:
    MAIN = 0


class Wikipedia:
    def __init__(self, *args, **kwargs):
        pass

    def __getattr__(self, name):
        raise NotImplementedError(
            f'wikipediaapi.{name} is HTTP transport — outside the measured stages')
