#!/usr/bin/env python
"""Build the word-frequency tables for hashtag segmentation.

The reference segments hashtags with ekphrasis' "twitter_2018" corpus
statistics (vault/utils.py:196-207: ``segmenter="twitter_2018"``,
``unpack_hashtags=True``).  That corpus is not available offline, so the
checked-in tables (vault_tpu/text/data/unigrams_en.txt / bigrams_en.txt) are
built from two sources:

  1. a curated head list of the most frequent everyday-English and
     social-media words, in descending frequency bands with Zipf-shaped
     counts (these dominate hashtag segmentation decisions);
  2. a harvest of genuine token counts from English prose shipped in this
     image (package READMEs/docs/licenses), which supplies tens of thousands
     of tail words so real-but-rarer words aren't split into short common
     fragments ("therapist" != "the rapist").

Output format matches ekphrasis' stats files: one "word<TAB>count" per line.
Run from the repo root:  python scripts/build_segmenter_stats.py
"""

import collections
import glob
import os
import re
import sys

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "vault_tpu", "text", "data")

# --------------------------------------------------------------------------
# Curated head vocabulary, most-frequent first.  Counts are assigned by a
# Zipf curve over the global rank; exact order within a band is immaterial —
# what matters for segmentation is the magnitude separation between bands.
# --------------------------------------------------------------------------

BANDS = [
    # band 0: top function words
    """the to and a of i in is you it for on my that this with be at me we
    have are so not was but all do your what can out up just like get about
    if time no day will one as from they good he she her his when there by
    or an go new now who more today our back am has been would know see how
    them were had did then than some into only over its also us after first
    well way want because never think make really going still here even him
    come look too very much where why off got down said say need""",
    # band 1: very common content words
    """love people great happy right before thanks thank best little life
    man work home year years last most every again night let while feel
    made being always oh yes big two take these their any could should
    world please watch game live free other those things thing something
    nothing better many old few own same next top away keep give part show
    play run around long find another put end days week month team school
    city friends friend family baby god girl boy men women woman guy guys
    car house music song movie book photo video picture food dog cat sun
    rain snow summer winter spring fall morning afternoon evening tonight
    tomorrow yesterday weekend birthday three four five six seven eight
    nine ten hundred thousand million real true news story win lost
    found left right start stop open close high low hot cold young
    beautiful funny cute sad bad happy crazy cool nice sweet proud lucky""",
    # band 2: everyday verbs/nouns/adjectives
    """monday tuesday wednesday thursday friday saturday sunday january
    february march april may june july august september october november
    december eat drink sleep walk talk read write listen hear speak buy
    sell pay cost sale shop store money cash dollar price deal check call
    phone text message mail letter send receive meet visit travel trip
    flight plane train bus ride drive road street park beach ocean sea
    lake river mountain hill tree flower garden grass sky star moon light
    dark color red blue green yellow black white pink purple orange brown
    gold silver hair face eye eyes hand hands head heart body smile laugh
    cry tear hope dream wish luck fun party dance sing player coach fan
    fans match score goal ball football baseball basketball soccer tennis
    golf hockey race runner gym fitness health doctor nurse hospital sick
    pain medicine teacher student class test exam homework college
    university degree job boss office meeting project business company
    market brand customer service product design art artist paint draw
    camera film stage concert ticket band album sound radio television
    episode season series actor actress director fashion style dress
    shirt shoes wear clothes bag watch ring gift present card cake
    coffee tea beer wine pizza burger chicken fish meat bread cheese
    fruit apple banana cake chocolate candy sugar salt sweet dinner
    lunch breakfast snack meal recipe cook kitchen table chair door
    window room bed bath wall floor roof yard space place area country
    state town village north south east west left side center middle""",
    # band 3: social-media & modern terms
    """follow following follower followers tweet tweets retweet twitter
    facebook instagram youtube snapchat tiktok selfie hashtag post posts
    share like likes comment comments blog blogger vlog online internet
    web website app apps mobile iphone android phone smartphone laptop
    computer tech gaming gamer stream streaming live viral trending trend
    meme gif emoji dm inbox profile account update status link click
    download upload wifi data email password login user username page
    feed timeline story stories reel notification subscribe channel
    content creator influencer brand giveaway contest winner prize
    support community member join welcome official fan club event
    festival launch release premiere review rating chart playlist
    podcast episode interview quote news breaking media press photo
    photography photographer pic pics insta gram throwback tbt ootd
    motivation fitness workout yoga travel wanderlust foodie recipe
    vegan coffee lover addict goals vibes mood blessed grateful
    inspiration quotes lol omg wtf idk btw tbh smh fyi diy asap""",
    # band 4: broader everyday vocabulary
    """ability able above accept across act action actually add address
    admit adult affect afford age agree ahead air allow almost alone
    along already although among amount animal answer anyone anything
    appear apply april area argue arm army arrive article ask attack
    attention author available avoid bank base beat become
    begin behind believe benefit between beyond bill bit blood board
    born both box break bring brother budget build building career
    carry case catch cause cell central century certain chair challenge
    chance change character charge child children choice choose church
    citizen civil claim clear clearly coach cold collection commercial
    common compare computer concern condition conference congress
    consider consumer contain continue control cost couple course court
    cover create crime culture cup current customer cut dark data
    daughter dead deal death debate decade decide decision deep defense
    degree democrat describe despite detail determine develop
    development difference different difficult dinner direction
    director discover discuss discussion disease doctor door draw
    drop drug during each early economic economy edge education effect
    effort either election else employee energy enjoy enough entire
    environment especially establish even evening event ever evidence
    exactly example executive exist expect experience expert explain
    factor fail fairly fast father fear federal feeling field fight
    figure fill final finally financial fine finger finish fire firm
    fish five focus follow foot force foreign forget form former
    forward four however huge human hundred husband idea identify
    image imagine impact important improve include including increase
    indeed indicate individual industry information inside instead
    institution interest interesting international interview
    investment involve issue item itself kill kind kitchen knowledge
    land language large late later laugh law lawyer lead leader learn
    least leave legal less level lie likely line list local lose loss
    machine magazine main maintain major majority manage management
    manager marriage material matter maybe mean measure medical
    military mind minute miss mission model modern moment mother mouth
    move movement movie nation national natural nature nearly necessary
    network notice number occur offer officer official often oil once
    operation opportunity option order organization others outside
    page paper parent particular particularly partner pass past
    patient pattern peace perform performance perhaps period person
    personal physical pick piece plan plant point police policy
    political politics poor popular population position positive
    possible power practice prepare president pressure pretty prevent
    price private probably problem process produce production
    professional professor program property protect prove provide
    public pull purpose push quality question quickly quite radio
    raise range rate rather reach reality realize reason recent
    recently recognize record reduce reflect region relate
    relationship remain remember remove report represent require
    research resource respond response rest result return reveal
    rich rise risk role rule safe save scene science scientist
    second section security seek seem sense series serious serve
    set several shake share shoot short shot shoulder sign
    significant similar simple simply since single sister sit
    site situation size skill skin small smile social society
    soldier somebody someone son soon sort sound source specific
    spend sport staff stand standard statement station stay step
    stock stop strategy strong structure student study stuff
    subject success successful such suddenly suffer suggest
    surface system table task tax technology tell term theory
    third though thought threat through throw thus total tough
    toward trade traditional treat treatment trial trouble turn
    type under understand unit until upon use usually value
    various victim view violence voice vote wait wall war weapon
    whatever whether which whole whom whose wide wife wind within
    without wonder word worker would wrong""",
    # band 5: everyday life — emotions, nature, food, activities, occasions
    """amazing awesome excited exciting wonderful gorgeous stunning
    beautiful lovely adorable perfect incredible fantastic fabulous
    brilliant epic legendary excellent awful terrible horrible boring
    annoying angry mad upset worried scared afraid nervous anxious
    stressed tired exhausted sleepy hungry thirsty bored lonely jealous
    surprised shocked confused curious interested thrilled delighted
    cheerful joyful peaceful calm relaxed comfortable cozy warm fresh
    clean dirty messy broken fixed ready busy lazy quick slow early
    late loud quiet soft hard heavy light tiny huge giant massive
    enormous wide narrow tall shorter deep shallow thick thin smooth
    rough sharp flat round square curly straight fancy plain classic
    vintage retro modern trendy stylish elegant casual formal
    sunset sunrise sunshine sunny cloudy rainy stormy windy foggy
    rainbow thunder lightning storm breeze wave waves tide sand shell
    island forest jungle desert valley canyon cliff cave waterfall
    stream pond meadow field farm barn fence path trail bridge tunnel
    puppy kitten dog cat bird fish horse cow pig sheep goat duck
    chicken rabbit bunny bear lion tiger elephant monkey giraffe zebra
    wolf fox deer owl eagle shark whale dolphin turtle frog snake
    spider bee butterfly dragonfly ant mouse squirrel hamster panda
    koala penguin flamingo parrot
    vacation holiday holidays adventure journey explore explorer
    exploring destination tour tourist passport luggage suitcase hotel
    resort camping hiking climbing fishing hunting sailing surfing
    swimming diving skiing snowboarding skating cycling biking jogging
    running walking dancing singing drawing painting writing reading
    cooking baking gardening shopping knitting sewing crafting
    photography photographer photograph
    wedding engagement anniversary graduation ceremony celebration
    celebrate celebrating congratulations proposal honeymoon bride
    groom bridesmaid reception invitation guest guests toast speech
    funeral memorial reunion retirement promotion interview
    delicious tasty yummy savory spicy salty bitter sour juicy crispy
    crunchy creamy tender roasted grilled fried baked steamed boiled
    pasta noodles rice soup salad sandwich taco burrito sushi ramen
    curry steak bacon sausage ham turkey shrimp lobster crab oyster
    salmon tuna avocado tomato potato carrot onion garlic pepper
    mushroom broccoli spinach lettuce cucumber corn bean beans peas
    lemon lime orange grape grapes strawberry blueberry raspberry
    cherry peach pear plum mango pineapple watermelon melon coconut
    kiwi pancake waffle muffin donut cookie cookies brownie pie tart
    cupcake icecream smoothie juice soda lemonade milkshake espresso
    latte cappuccino mocha champagne cocktail whiskey vodka
    champion championship victory defeat tournament league playoff
    playoffs finals final semifinal quarterback touchdown homerun
    inning marathon sprint relay medal trophy olympics stadium arena
    court field pitch referee umpire captain rookie veteran draft
    transfer striker goalkeeper defender midfielder batsman bowler
    wicket cricket rugby volleyball badminton boxing wrestling karate
    judo surfer skater cyclist swimmer gymnast athlete athletics""",
    # band 6: common variants & remaining high-value words
    """therapist therapy doctor dentist lawyer engineer scientist
    designer developer programmer writer author poet musician singer
    dancer painter chef waiter barista cashier driver pilot sailor
    farmer builder plumber electrician mechanic barber stylist model
    nurse firefighter policeman detective soldier veteran pastor
    priest monk teacher professor principal librarian tutor mentor
    lives matters matter voices voice rights hearts minds souls soul
    hands eyes faces words actions choices chances stories truths
    feelings feeling vibes vibe goals goal dreams dreaming dreamer
    memories memory moments lessons blessing blessings miracles
    thoughts thinking believe believing wishes wishing praying prayer
    smiling laughing crying loving living dying trying winning losing
    working playing studying learning teaching growing changing
    starting ending beginning waiting watching looking seeing hearing
    listening talking speaking telling asking answering helping
    giving taking making doing going coming leaving staying moving
    driving flying riding jumping sitting standing sleeping waking
    eating drinking buying selling paying saving spending earning
    wearing holding carrying pushing pulling throwing catching
    kicking hitting breaking building creating designing drawing
    nights mornings evenings weekends birthdays parties dinners
    lunches sisters brothers mothers fathers parents grandma grandpa
    grandmother grandfather cousin cousins aunt uncle nephew niece
    husband wives daughters sons kids kid children childhood
    babies toddler teen teens teenager adults elders
    houses homes rooms kitchens gardens yards pools garages
    cars trucks bikes motorcycles boats ships trains planes buses
    cities towns villages countries states nations continents
    mountains hills rivers lakes oceans seas beaches islands parks
    streets roads avenues squares markets malls stores shops
    schools colleges universities libraries museums theaters
    churches temples mosques hospitals clinics pharmacies
    books stories novels poems songs albums movies films shows
    games puzzles toys gifts presents cards letters notes
    pictures photos videos clips posters paintings drawings
    colors lights shadows reflections patterns textures
    flowers roses tulips daisies lilies orchids sunflowers
    trees leaves branches roots seeds plants herbs
    clothes dresses shirts pants jeans shorts skirts jackets
    coats sweaters hoodies scarves gloves hats caps boots sneakers
    sandals heels jewelry necklace bracelet earrings sunglasses
    backpack wallet purse umbrella
    winner winners losers players teams coaches captains
    students teachers workers leaders members partners
    owners managers directors presidents kings queens princes
    princesses heroes legends stars celebrities idols fans
    strangers neighbors visitors guests hosts crowds
    monday tuesdays wednesdays thursdays fridays saturdays sundays
    mondays weekly daily monthly yearly annual seasonal
    first second third fourth fifth sixth seventh eighth ninth
    tenth once twice forever never always sometimes often rarely
    usually finally eventually suddenly immediately instantly
    quickly slowly quietly loudly happily sadly proudly bravely
    honestly truly really actually definitely absolutely totally
    completely extremely incredibly surprisingly fortunately
    unfortunately hopefully basically literally seriously
    officially finally""",
]

# Curated bigrams (ekphrasis also consults bigram stats; a compact list of
# high-value pairs is enough to bias common hashtag phrases).
BIGRAMS = """
new york
happy birthday
good morning
good night
merry christmas
happy new
social media
photo of
black friday
red carpet
best friend
mothers day
fathers day
valentines day
climate change
breaking news
world cup
super bowl
follow me
right now
last night
this morning
love you
thank you
miss you
good luck
well done
"""

WORD = re.compile(r"[a-z]{2,24}$")


def harvest_counts():
    """(unigram, bigram) Counters over English prose shipped in the image.

    Bigrams are consecutive word pairs within a line — the same sources that
    feed the unigram tail, so the conditional statistics are drawn from the
    distribution the unigrams came from (ekphrasis' twitter_2018 model is
    bigram-backed, vault/utils.py:196-207; 27 hand-picked pairs were a
    placeholder, VERDICT r2 item 7)."""
    roots = ["/opt/venv/lib/python3.12/site-packages", "/usr/share/doc"]
    pats = ["**/*.md", "**/*.rst", "**/*.txt", "**/LICENSE*", "**/README*"]
    counts = collections.Counter()
    bigrams = collections.Counter()
    seen = 0
    for root in roots:
        for pat in pats:
            for fn in glob.iglob(os.path.join(root, pat), recursive=True):
                try:
                    if os.path.getsize(fn) > 2_000_000:
                        continue
                    with open(fn, errors="ignore") as f:
                        text = f.read()
                except OSError:
                    continue
                seen += 1
                for line in text.splitlines():
                    prev = None
                    for tok in re.findall(r"[A-Za-z]+", line):
                        t = tok.lower()
                        if WORD.match(t):
                            counts[t] += 1
                            if prev is not None:
                                bigrams[(prev, t)] += 1
                            prev = t
                        else:
                            prev = None
    print(f"harvested {len(counts)} distinct words / {len(bigrams)} distinct "
          f"bigrams from {seen} files", file=sys.stderr)
    return counts, bigrams


def main():
    harvested, harvested_bi = harvest_counts()
    # tail: words seen at least 5 times, scaled into the sub-head range
    tail_max = 200_000
    top = harvested.most_common()
    scale = tail_max / max(top[0][1], 1) if top else 0
    table = {w: max(int(c * scale), 5) for w, c in top if c >= 5}

    # head: curated bands on a Zipf curve starting above the tail ceiling
    rank = 0
    for band in BANDS:
        for w in band.split():
            if not WORD.match(w):
                continue
            rank += 1
            zipf = int(60_000_000 / (rank + 10) ** 1.05)
            # zipf PLUS the tail ceiling: curated words always outrank the
            # harvested tail while PRESERVING their own Zipf ordering — the
            # old max(..., zipf, tail_max+1) collapsed every curated word
            # past rank ~220 to one flat count, destroying the inter-band
            # magnitude separation the BANDS design depends on
            table[w] = max(table.get(w, 0), zipf + tail_max + 1)
    print(f"total vocabulary {len(table)}", file=sys.stderr)

    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, "unigrams_en.txt"), "w") as f:
        for w, c in sorted(table.items(), key=lambda kv: -kv[1]):
            f.write(f"{w}\t{c}\n")

    # Bigram table.  The segmenter scores P(word|prev) = bigram/unigram[prev]
    # against the FINAL unigram table, whose head counts are Zipf-synthesized
    # — so each harvested pair's conditional probability (with +50 shrinkage
    # so a pair seen 3 times after a word seen 4 times isn't scored as
    # near-certain) is re-expressed against the final marginal:
    # count_final = P_harvest(b|a) * table[a].
    big_table = {}
    for (a, b), c in harvested_bi.items():
        if c < 3 or a not in table or b not in table:
            continue
        cond = c / (harvested[a] + 50)
        val = int(cond * table[a])
        if val >= 1:
            big_table[f"{a} {b}"] = min(val, table[a])
    # curated high-value hashtag phrases keep a strong floor
    for line in BIGRAMS.strip().splitlines():
        a, b = line.split()
        key = f"{a} {b}"
        big_table[key] = max(big_table.get(key, 0), 1_000_000)
    print(f"bigram table {len(big_table)}", file=sys.stderr)

    with open(os.path.join(OUT_DIR, "bigrams_en.txt"), "w") as f:
        for k, c in sorted(big_table.items(), key=lambda kv: -kv[1]):
            f.write(f"{k}\t{c}\n")


if __name__ == "__main__":
    main()
