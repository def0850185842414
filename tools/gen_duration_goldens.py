# faithful transcription of jagular/utils.py:583-647 (PrettyDuration
# to_dhms/time_string) to produce golden fixtures
from math import floor, isinf
from collections import namedtuple

def to_dhms(seconds):
    pos = seconds >= 0
    if not pos:
        seconds = -seconds
    ms = seconds % 1; ms = round(ms*10000)/10
    seconds = floor(seconds)
    m, s = divmod(seconds, 60)
    h, m = divmod(m, 60)
    d, h = divmod(h, 24)
    Time = namedtuple('Time', 'pos dd hh mm ss ms')
    return Time(pos=pos, dd=d, hh=h, mm=m, ss=s, ms=ms)

def time_string(seconds):
    if isinf(seconds):
        return 'inf'
    pos, dd, hh, mm, ss, s = to_dhms(seconds)
    if s > 0:
        if mm == 0:
            sstr = str(s/1000).lstrip('0')
        else:
            sstr = ":{:03d}".format(int(s))
    else:
        sstr = ""
    if dd > 0:
        daystr = "{:01d} days ".format(int(dd))
    else:
        daystr = ""
    if hh > 0:
        timestr = daystr + "{:01d}:{:02d}:{:02d}{} hours".format(hh, mm, ss, sstr)
    elif mm > 0:
        timestr = daystr + "{:01d}:{:02d}{} minutes".format(mm, ss, sstr)
    elif ss > 0:
        timestr = daystr + "{:01d}{} seconds".format(ss, sstr)
    else:
        timestr = daystr + "{} milliseconds".format(s)
    if not pos:
        timestr = "-" + timestr
    return timestr

cases = [0, 0.0005, 0.05, 0.1235, 0.5, 1, 1.5, 3.5, 59, 59.9, 59.99996,
         60, 61, 65.5, 120.25, 3599, 3600, 3600.5, 3725.5, 7325.001,
         86400, 86401, 90061.5, 172800.123, 259200,
         -0.5, -1, -3.5, -61, -3725.5, -86401,
         float('inf'), float('-inf')]
for c in cases:
    print(repr(c), '|', time_string(c))
