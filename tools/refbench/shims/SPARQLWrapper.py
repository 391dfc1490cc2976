# Import-resolution stand-in for `SPARQLWrapper` (HTTP transport; the
# measured stages only CONSTRUCT it inside WikiAPI.__init__). Any
# actual query fails loudly.
JSON = 'json'


class SPARQLWrapper:
    def __init__(self, *args, **kwargs):
        pass

    def setMethod(self, *args, **kwargs):
        pass

    def setReturnFormat(self, *args, **kwargs):
        pass

    def setQuery(self, *args, **kwargs):
        raise NotImplementedError('SPARQL is transport — outside the measured stages')
