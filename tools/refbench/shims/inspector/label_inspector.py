# Import-resolution stand-in: Inspector is the NameAI scoring engine,
# never invoked by the measured stages. Fails loudly if constructed.
class Inspector:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError('Inspector is outside the measured stages')
