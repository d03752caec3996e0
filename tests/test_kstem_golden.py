"""Golden KStem fidelity test (VERDICT r2 item 3, extended r4 to 1k+ pairs).

KStem input->output pairs (public algorithm: Krovetz '93, "Viewing
morphology as an inference process"; behavior as shipped in Lucene's
KStemmer / the reference's `english` analyzer chain, QryParser.java:
45-51). `krovetz_lite` implements the full dictionary-first multi-step
algorithm over the embedded KSTEM_LEXICON head dictionary; the GOLDEN
table below — >=1,000 pairs generated from an authored base-word
morphology table plus irregular/identity sets — must reproduce every
pair exactly. Words whose real-KStem output depends on lexicon
DISAMBIGUATION we cannot replicate (axes -> axis|axe) are pinned in
DIVERGES with the current output and a rationale — the list is the
documented fidelity gap, and any unintended behavior change trips it.

Also proves the DuckDB oracle CASE (gate._kstem_sql) replays
krovetz_lite byte-for-byte over every word in all tables plus a fuzz
sample — the CLAUDE.md tokenization invariant.
"""

import duckdb
import pytest

from searchengine_spark.analyzer import (
    KSTEM_EXCEPTIONS,
    KSTEM_LEXICON,
    krovetz_lite,
)
from searchengine_spark.gate import _kstem_sql

# ---------------------------------------------------------------------------
# Base-word morphology tables. The GOLDEN pairs are generated FORWARD
# (base -> correctly spelled English inflections) so the expected
# conflation (inflection -> base) is right by construction for these
# regular, in-lexicon words — exactly the class real KStem resolves via
# its dictionary. Classes: 'p' plain, 'e' silent-e final, 'd' final
# consonant doubles, 'y' consonant+y final, 'es' o/s-final +es plural.
# ---------------------------------------------------------------------------

E_VERBS = """create move serve merge dance score hope note change charge close
compare complete continue declare define describe determine divide encourage
engage escape examine exchange excuse expose face file force gaze glance guide
handle hate ignore imagine improve include indicate involve judge like locate
love manage measure notice observe operate oppose organize phrase
picture place please practice prepare produce promise propose provide
purchase
raise realize receive recognize reduce refuse relate release remove replace
require rescue reserve resolve retire save schedule separate settle share
shave smile smoke solve stare state store struggle suppose survive taste trade
translate type value vote wave welcome breathe cause base case unite invite
promote prove cite cure date dare figure cycle issue pause route argue achieve
believe challenge arrange arrive advance balance bottle""".split()

D_VERBS = """stop plan drop grab ship shop chat clap drag drum flip grin hug
jog knit nod pat pin plug pop rub scan skip slam slip snap spot step stir tag
tap trap trim trip wrap zip admit commit permit submit regret occur refer
prefer control patrol""".split()

# irregular pasts -> only -s and -ing forms
SI_VERBS = """run swim spin begin split""".split()

Y_VERBS = """carry marry study try cry dry fry apply supply reply deny rely
vary copy envy worry hurry empty fancy identify justify modify notify occupy
qualify satisfy simplify specify verify classify multiply testify ferry""".split()

P_VERBS = """walk jump look seem clean treat ask work call turn help
talk start play show open follow offer remember consider appear wait attack
attend avoid report explain develop suggest remain happen listen cover reach
touch finish publish punish vanish accomplish establish flourish act add aid
aim alarm alert allow answer arrest assist attempt award back bank blast boil
bomb book boost borrow brand burn claim climb coach collect comfort command
comment conduct confirm connect consist contain correct count crash crawl
cross crowd deliver demand depend design destroy detect direct discuss
disturb earn edit elect employ end enjoy enter exist expand expect experiment
export express extend fail fear fill fix flash float flood flow fold form
gain gather govern guess hand harm head heat host hunt impact import impress
inform insist install instruct intend interview invent invest join kick kill
land last laugh launch lean learn lift limit link list load lock mark match
mind mix mount murder object obtain order own pack park perform pick plant
point predict present prevent print process protect protest pull pump punch
push rain rank reason record recruit reflect reform relax remark remind rent
repair repeat request respect respond rest result return review reward risk
roar rock roll rush sail scream seal season select shift shout sign signal
sound spell stay steam storm stream strengthen stress stretch subject suffer
support suspect sustain switch target test thank threaten track trust
twist visit want warm warn wash watch wish yell pass press miss kiss
mention talk burn pick suspect""".split()

# -ing form is a lexicalized noun (painting/feeling/training/... identity
# below), so only -s/-ed are generated for these
P_VERBS_NO_ING = """paint interest train""".split()

NOUNS = """car door table brick engine system city army body party box church
brush glass tax shoe page house cave game book tree road hill star moon river
mountain valley island ocean forest field farm garden flower plant animal
bird horse cat dog lion tiger bear school student teacher lesson paper pencil
computer phone screen window wall floor roof room kitchen chair desk lamp
clock camera picture photo video song letter word sentence story novel poem
writer reader doctor nurse lawyer farmer worker player singer actor artist
driver pilot soldier king queen prince princess leader member friend family
parent baby boy girl uncle aunt cousin neighbor guest visitor enemy country
nation state region area town village street bridge tower castle palace
temple market store hotel hospital station airport port factory office
company industry product service price cost profit dollar bank account card
ticket contract deal job career skill goal project task duty role rule law
right power energy source resource material metal stone rock sand bone boat
chain cell club coast code college court cup debate decade degree desert
device dream dress effect effort element event example fact faith fashion
father mother sister film fund gate grade graph hero potato tomato echo
movie key item unit theory title tool tour path pattern peace piece policy
position problem question range rate rhythm rope salt seat sheet site size
space spirit sport square stage stamp stair term time tip wheel width wing
yard year machine mail model muscle music name nature nerve night noise
oven""".split()

ES_NOUNS = """hero potato tomato echo bus""".split()

# real KStem lexicon words returned unchanged (rules would mangle them)
IDENTITY = """news series species analysis basis crisis thesis hypothesis
emphasis diagnosis physics mathematics economics politics during morning
evening nothing something anything everything string spring sterling hundred
indeed speed feed need seed deed exceed proceed succeed breed bleed creed
greed wicked hatred sacred naked lens chaos bias alias canvas atlas this
always perhaps besides whereas sometimes clothes scissors headquarters
meeting building feeling wedding ceiling clothing painting being going
business campus census virus class press was its king sing thing ring red
bed""".split()


# ---------------------------------------------------------------------------
# Round-4 expansion: the lexicon grew ~950 -> ~4,000 entries (analyzer.py);
# these tables extend the forward-generated goldens over the new words.
# Same classes as above; words whose golden would collide with a
# dictionary-first identity entry (pants, bureau, menu, shingle) are
# lexicon-only and appear in no table.
# ---------------------------------------------------------------------------

E_VERBS2 = """abuse accuse acquire admire advise allocate amaze analyze anticipate
apologize appreciate approve arouse assemble associate assume assure
attribute authorize bake blame bounce brace bribe browse bundle calculate
capture care carve cease celebrate circulate collapse combine communicate
compete compile compose compute conceive concentrate conclude configure
confuse conserve console consume contribute converse convince cooperate
coordinate cope criticize cruise cultivate curse curve damage deceive decide
decline decorate decrease dedicate delegate delete demonstrate denote derive
deserve designate desire devote dictate dilute dispose dispute dissolve
distribute dive dominate donate drape educate elaborate eliminate embrace
emerge emphasize enable enforce enhance enlarge ensure entitle erase erode
escalate estimate evaluate evolve exaggerate exclude execute exhale expire
explode fade fascinate finance fine frame fuse generate glide glimpse grace
graduate grate hesitate hire illustrate imitate immigrate incline
incorporate indulge inhale initiate inquire inspire integrate interfere
introduce intrude invade investigate invoke isolate lease leverage license
manipulate mate mediate memorize migrate minimize mobilize motivate navigate
negotiate nominate obligate obscure ooze optimize orchestrate outline
participate paste perceive persuade phase pierce pledge plunge poke populate
pose pounce praise precede pressure presume prioritize probe pronounce
pursue quote rage recite reconcile recreate recycle redefine refine regulate
reinforce rejoice relocate rename reproduce reschedule resemble reside
resume retrieve reuse reverse revise revoke rinse rotate sacrifice scare
scrape secure seize sense shape simulate sizzle slice sneeze snore soothe
spare speculate spike squeeze stabilize stake stimulate stipulate stroke
style subscribe substitute summarize supervise surface surge swerve tangle
tape tease terminate theorize tolerate trace transcribe transfuse transpose
tremble trudge tune underline undermine update upgrade urge utilize validate
venture verge vibrate violate visualize wade waste wince wrestle""".split()

D_VERBS2 = """bat chop clip cram dim dip dot equip flag flap flop fog grip hop hum jot kid
lag map mob mop mug nap pad peg pet pit plod plot prod prop ram rap rig rip
rob rot scam scrap scrub shred shrug shun sip skim slap slot snag sob spam
span spar splat spur squat stab stem strap strip strut stub stun sum swap
tan throb tip top trek trot tug whip zag zig""".split()

Y_VERBS2 = """accompany amplify beautify bully bury certify clarify crucify defy dignify
dirty edify embody falsify fortify glorify gratify horrify imply intensify
levy lobby magnify mystify nullify pacify parry personify pity prophesy pry
purify quantify rally ratify rectify remedy signify solidify spy steady
stratify sully tally tarry terrify tidy unify vilify weary""".split()

P_VERBS2 = """absorb accept acclaim accustom adapt adjust adopt afford align amend anchor
annoy appeal appoint assault assert assign attract audit await bark bash
beam belong benefit betray blend bless bloom boast bolt bond boom breach
brood cash caution cheat chew churn clash clench cloak coexist coil comb
combat commend complain conform confront conquer consent construct consult
contact contend convert convey cool correspond cough counsel crack craft
cramp creak crouch crunch curb curl dart dash dawn decay deem defeat defend
delay delight depart deposit descend despair detach devour differ disappear
disappoint discard discern discount dishearten dismiss disobey dispatch
display disrupt dissent distort distract distress drain dread drench drift
drill drown dwell eject embark enact enchant encounter engulf enlist enrich
enroll entail entrust erupt exalt exert exhaust exhibit exploit extract
faint fetch flank flaunt flinch fling flock flush foam forfeit fork foul
frown fulfill furnish garnish glow gnaw greet grill groan growl grunt gush
halt hammer hamper harvest hatch haunt heed hinder hiss hoist honk hover
howl hurl insert inspect insult interact intercept interpret interrupt
invert jest jolt knock lack lament lash latch leak leap lick linger loom
lurk maintain mask mend mentor moan mock mold monitor mourn muster nail
narrow nest numb obey obsess offend orbit overhaul overturn pardon patch
peck peel perch perish persist pinch pluck polish ponder pout preach prick
proclaim prolong prompt prosper prowl purr quench quiver ransack rant react
reap recall reckon recount recover redeem reek refrain refresh refund regain
render renew reprint resent resign resist restrict retain retort retreat
reveal revert revolt roam roast rust scold scoop scorch scorn scour scowl
scratch scrawl screech shatter shield shiver shriek sigh simmer sketch slant
slash slump smash smirk snatch sneer sniff snort soak soar spawn spill
splash spoil sprawl sprint sprout spurn squeal squint stack stalk stall
stammer steer stomp stoop strain stroll subtract succumb sulk summon surpass
surrender swallow swarm sway swell swirl tarnish taunt tempt thrash thrust
thud tilt toil torment toss tow trail tramp transact transform transplant
transport trick triumph twirl twitch unearth unfold unleash unload unlock
unveil uproot usher utter vent vow wail wander waver whirl whisk wield
wither witness worship wreck yank yearn yield""".split()

NOUNS2 = """ache acre agenda aisle album algorithm alley almond altar angle ankle anthem
apartment apple apron arch arena array arrow aspect asset athlete atom attic
auction audience author avatar avenue bacon badge bag ball balloon ballot
bamboo banana band banner bar barn barrel basement basin basket battle bay
beach bead beak bean beard beast beaver bee beef beetle bell belt bench
beverage bicycle bill bin biscuit bishop bite blade blanket blog blossom
blouse bonnet bonus border bouquet bowl bracelet brain brass breeze brigade
brim brink bronze broom brow browser bucket bud budget bulb bull bullet
bunker burden burrow bush butler butter button byte cabin cabinet cable
cactus cage cake calorie camel campaign canal candle cannon canoe canyon cap
cape capital captain carbon carcass carpet carrot cart carton cartoon
cascade casket cedar cellar cement chalk chamber channel chapel chapter
charcoal chariot charm cheese chef chest chicken chief chimney chin chip
chocolate choir chord chorus cigar cinema circuit citizen clan clause claw
clay cliff climate cloth clown clue cluster clutch coal coat cobweb cocoa
coconut coffin coin collar column comet commerce committee compass compiler
concert concrete cone conscience continent contour cookie copper coral cord
core cork corpse corridor costume cottage cotton couch council counter
courage courtyard crab cradle crane crate crater crayon cream creature
crevice crew crib cricket crime crown crumb crust crystal cube cucumber cuff
cupboard curtain cushion custard customer dam damsel database deck defense
demon den denim dentist depot depth detail detective dew diagram dial
diameter diamond dime dinner dirt disc disk ditch dock doctrine dome donkey
dough dove download dozen dragon drawer droplet drought duck duke dusk dust
eagle ear earthquake easel eclipse eel elbow elephant email emblem emperor
empire engineer entrance envelope equator era errand essay estate ether exam
exit fabric falcon fang fare feather fee fence fern fever fiber fig filter
fin finger fist flake flame flannel flask fleet flesh flint flour flute
folder fort fortress fortune forum fossil fountain fowl fox fragment freight
fringe frog frontier frost fruit fuel funnel fur furnace gadget gala gallon
gang gap garage garment gear gem general germ giant gift gigabyte ginger
giraffe glacier gland globe glove glue goat gold gorge gospel gown grain
gram granite grape gravel grease grid grief grove guild guitar gulf gull
gutter habit hail hall harbor hardware hare harness harp hashtag hawk hay
hazard haze headache headset hedge helmet hen herd hermit hinge hive hockey
hog home honey hood hoof hook horizon horn hose hound hull hut hymn iceberg
icon idol igloo image impulse incense inch infant ink inlet inn insect
instance institute instrument internet iron jacket jail jar jaw jewel joint
joke journal journey jug juice jungle junior junk justice keg kennel kernel
kettle keyboard kidney kiosk kite kitten knee knight knob knot label lace
ladder lake lantern lap lapel lapse laptop laser lava lawn layer leaflet
ledge legend lemon length leopard lever lexicon lid ligament limb lime
limestone linen lip liquid liver lizard lobster lodge loft log login logout
loop lord lotus lumber lump lung lyric magnet maid mammal mansion mantle
manual manuscript maple marble margin marsh mast mat mattress maze meadow
meal medal megabyte melon mermaid mesh message meteor method midst mile mill
mineral mint miracle mirror mist moat mode modem mole monarch monk monkey
monster monument mood morsel mosaic mosque moss motel moth motion motive
motor mound mouth mud mule mural museum mushroom musket mustache mustard
mutton myth napkin neck needle nephew network niche nickel niece node
nonsense noon north notch notebook notion nozzle nugget nun nut oak oar oath
oatmeal odor offense onion opera orange orchard orchestra organ ornament
orphan ostrich otter ounce outfit outlet oval owl owner oxygen oyster pace
paddle pail palm panel panic panther parade parcel parish parlor parrot
parser parsley password pasture pea peach peak peanut pear pearl peasant
pebble pedal pension pepper perfume peril pest petal pew pigeon pile pillar
pillow pine pint pipe pistol piston pitcher pixel plain plane planet plank
plaster plate platform platter playlist plaza plight plum plumber pocket pod
podcast polygon pond porch pork porter portion portrait post pot pouch
powder prairie prey pride priest printer prize profile prophet prose pulpit
pulse pupil puppet purse puzzle pyramid quart quarter quartz quest queue
quill quilt rabbit raccoon rack radar raft rag rail rainbow ramp rat ravine
razor realm rear reef reign rein relic remnant reptile residue resin ribbon
rice ridge rifle rim rind riot ripple rite ritual rival robe robot rocket
rod rogue rooster root router rubble rudder ruin rum rumor runtime sack
saddle saga sage saint salad salmon salon saloon sap sapling sardine satchel
sauce saucer sausage scaffold scale scalp scanner scar scarlet scene scent
scepter schema scheme scholar scooter scope scroll sculptor sculpture scythe
seam seaweed sect sector sedan seminar senator sentinel sergeant serpent
servant server session shack shaft shampoo shard shark shawl shear shell
shepherd sheriff shin shore shovel shrine shrub shutter sickle siege sieve
silk sill silver sin sinew siren skeleton skillet skin skirt skull slab
slate sled sleeve slope smartphone smock snail snake sock sofa software soup
spade spark sparrow spear speck sphere spice spider spine spire spleen
sponge spoon spouse spout spreadsheet sprig spruce squad squadron squirrel
stable stadium staff stain stairway stanza startup statue stature steak
steed steeple stern stew steward stock stool strand stripe stump suburb
subway suffix sugar sulfur sultan summit surf surgeon suspense swamp
swan sweater sword syllable symbol symptom syrup tablet tail tailor tale
talent tank tanker tar tariff tart tassel tavern tea teapot tear telescope
temper tenant tendon tent terrace text textile texture theme thicket thigh
thorn thread throne thumb thunder tide tile tin tissue toad toast toe toll
tomb ton tone tongue tonic torch torso tortoise tournament tractor traffic
trait tray treasure trench triangle tribe trolley troop trough trout truck
trumpet trunk tub tube tulip tunnel turban turbine turkey turnip turret
turtle tusk tutor tweed twig twilight twine udder umbrella umpire uniform
universe upload urn user username vaccine vagabond vale valve van vanilla
vapor vase vault vein velvet vendor venom verse vessel vest veteran viaduct
vice victim vigor villa vine vinegar vineyard violet violin viper visa vista
vitamin volume voyage wafer waffle wagon waist wand ward wardrobe warehouse
warrant warrior wart wasp waterfall watermelon wax weapon weasel weather web
webcam website wedge weed whale wheat whisker whistle wick wig wiki willow
winch windmill wine wire wreath wren wrist yacht yak yarn yeast yoke yolk
zebra zombie zone zoo""".split()

Y_NOUNS = """ability academy activity agency anniversary anxiety authority bakery battery
biography boundary bounty butterfly category cavalry celebrity ceremony
charity chemistry colony community controversy county currency delivery
democracy density destiny dictionary difficulty discovery dynasty economy
embassy emergency entity entry facility faculty fantasy frequency galaxy
gallery geography geometry glory gravity grocery hierarchy history infantry
injury inventory irony ivory jury laboratory lady legacy liberty library
lottery loyalty luxury majority melody memory mercy ministry minority misery
monastery monopoly mystery nursery opportunity penalty personality
philosophy poetry priority privacy property prophecy quality quantity
raspberry reality recovery refinery responsibility robbery salary sanctuary
security seventy sixty society strategy strawberry subsidy summary surgery
sympathy symphony tapestry tendency territory theology therapy tragedy
treasury trilogy trophy university utility vacancy variety victory warranty""".split()

ES_NOUNS2 = """buffalo cargo domino embargo mango mosquito torpedo veto volcano""".split()

IDENTITY2 = """abacus able about above absent abstract absurd abundant academic across
actress acute adequate adulteress adverse aesthetic afraid africa again
against aggressive agile albeit alien alike alive almost alone along aloof
already although alumnus amass ambitious america amidst among amongst
ancient angry annual anonymous anxious anybody anyone anywhere apart
apparatus apparent appropriate april apt arid around arthritis artificial
asbestos ashamed asia aside asleep asparagus athletic atomic attractive
audible august authoress automatic average awake aware away awful awkward
axis bald bare baroness barracks barren basic beautiful because become
before behalf behind bellows below beneath beside between beyond billiards
bitter bizarre black bland blank bleak blind blond blue blunt bogus bold
bonus boss brave brief bright brilliant broad bronchitis brown brutal busy
bypass cactus canvass capable carcass careful careless caress casual
cautious certain chassis cheap checkers cheerful chilly chorus chronic
circus civic civil classic clever clumsy coarse cognitive coherent cold
colonial colorful comic common compact compass complex comprehensive
compress concise confident conscious conservative considerable consistent
constant contemporary content continuous convenient cordial corporate
corrupt cosmos costly could countess countless cozy crazy crisp critical
crucial crude cruel cumulative curious current cutlass cynical cypress daily
damp dangerous dark darkness dead deaf dear debris december decent deep
defiant definite deliberate delicate delicious dense dental dependent
desperate diabetes digital diligent diplomatic dire discus distant distinct
distress diverse divine dizzy domestic dominant dormant double down
downstairs drastic dress dual dubious duchess dull dumb durable duress
dynamic early earnest east eastern easy economic efficient elastic elder
electric elegant eligible eloquent embarrass eminent emotional empirical
empress emptiness enchantress enormous entire epic equivalent essential
eternal ethical ethnic ethos europe even ever every everybody everyone
everywhere evident evil exact excellent exotic expensive explicit express
external extinct extreme eyeglass fairly false famous fatal feasible
february federal feeble fertile fiberglass fierce fifteen fifty final
financial fiscal fitness flat flexible fluent fluid fond foolish foreign
formal former fortress forty four fragile frail frank frantic frequent
friday friendly frigid frugal full fundamental funny furious further
furthermore future gallows generic generous genetic genius gentle genuine
gigantic glad global gloomy goddess golden good goodness gorgeous governess
graceful gradual grand grave gray great green grim gross guilty handsome
handy happy harass hard harness harsh healthy heavy hectic heiress
henceforth herpes hidden high hitherto hollow holy honest horizontal hostess
hostile however huge human humble humid hungry huntress hybrid ideal idle
illness immense imminent immune imperial implicit inevitable infinite
informal inherent initial innate inner innocent inside instead intact
intense internal intimate into intricate invisible iris itself january jolly
joyful july june juvenile keen kind kindness kudos lame large late latent
lateral laundress lavish laziness lazy least legal legitimate lenient less
lethal liable liberal likely likewise limp linear lioness literal little
lively local logical loneliness lonely loose loud low loyal lucid lucky
lunar lush mad madness magnetic main major mandatory manifest many marine
massive mattress mature maybe meager mean meanwhile measles medical medieval
mellow mental mere messy might mightiness mild military minimal minor minus
mistress mobile moderate modern modest moist molasses monday moral moreover
mortal much mumps mundane municipal murderess must mutual myself mysterious
naive nasty national native naval near neat negative neither nervous neutral
never nevertheless nice nimble noble none nonetheless normal northern
notable notorious notwithstanding november nowhere nuclear nucleus numerous
obedient obese oblique oblong obsolete obvious october odd official offline
often once online onto openness optimal oral ordinary organic original
ornate orthodox other otherwise ought ourselves outer outside over overall
overpass overseas overt painful pale parallel partial particular passive
pathos patient peculiar pelvis perfect permanent perpetual persistent
personal petty physical pink pious pivotal plausible pleasant plump poetess
polar polite political poor popular portable positive possess possible
potent potential powerful pragmatic precious precise pregnant premier
prestigious pretty previous priestess primary prime primitive principal
prior pristine private probable productive profess profound prominent prone
proper proud prudent public punctual pure purple quaint qualitative
quantitative quick quiet quite rabies radiant radical radius rampant random
rapid rare rather rational raw ready really recent recess reckless
rectangular regal regional regress regular relative relevant reliable remote
repress rigid ripe robust romantic rotten rough round royal rural rustic
ruthless sadness salient sane sanitary sass saturday scarce scenic
seamstress secret secular selfish senior sensible september serene serious
seven seventeen several severe shall shallow sharp sheer shepherdess shiny
short should shy sick sickness silent silly similar simple since sincere
single sinister sixteen skeptical sleek slender slight slim sloppy slow
small smart smooth snug sober social soft solar sole solemn solid solitary
some somebody someone somewhere songstress soon sophisticated sorceress sore
sour south southern spacious sparse special specific spicy spiritual
splendid spontaneous stale stark stately static statistical steep sterile
stewardess sticky stiff still stout straight strange strategic stress strict
striking stubborn sturdy stylus subsequent subtle success sudden sufficient
suitable sullen sunday sunny superb superficial superior suppress supreme
sure surplus swift tall tame tangible technical tedious temporary temptress
tender tendinitis tennis tense tentative tepid terrible than thee themselves
thereafter thereby therefore therein thereof thereupon thick thickness thin
thirteen thirty thorough those though three through throughout thursday
tight tigress timid tiny tired together torrid total tough toward towards
toxic traitress tranquil transparent tremendous trespass tricky trivial
tropical tuesday twelve twenty ugly ultimate uncanny under underlying
underneath uneasy unique universal unknown unless until unto upon upper
upright upstairs urban urgent useful usual vacant vague vain valid valuable
vast verbal versus vertical very viable vibrant vicious vigilant vigorous
vile vintage violent viral virtual visible visual vital vivid vocal void
volatile voluntary vulnerable waitress wary weak weakness wealthy wednesday
weird wellness west western wet whatever when whenever where whereby wherein
whereupon wherever whether which whichever while whilst white whoever whole
whom whose wide wild wilderness willing wise within without witness witty
wooden worthy would wrong yellow young yourself zealous""".split()


# ---------------------------------------------------------------------------
# Round-5 expansion (VERDICT r4 item 1): ~2,700 more base words across the
# same morphology classes, self-checked against the existing tables for
# duplicate bases and inflection-key clashes before inclusion; every base
# is a KSTEM_LEXICON entry (test_all_bases_in_lexicon).
# ---------------------------------------------------------------------------

E_VERBS3 = """abbreviate accelerate accommodate accumulate activate advertise advocate
aggregate agitate alienate alleviate alternate amputate animate annotate
announce appease arbitrate articulate aspire assimilate automate avenge
barbecue berate calibrate captivate commemorate compensate complicate concede
condense condone confide confiscate congregate conjugate consecrate
consolidate contemplate convene converge correlate corroborate culminate
dazzle decelerate dehydrate delineate deprive detonate devastate deviate
devise differentiate dilate disagree discharge disclose discourage disguise
dislike dislodge dispense displace dissipate dissuade dodge dose douse
dramatize duplicate elevate elucidate emanate emancipate emigrate emulate
endorse endure engrave enslave entice enumerate enunciate equate eradicate
evacuate evade evaporate evoke excavate excite exhilarate exonerate expedite
experience expunge extrapolate exude fabricate facilitate fatigue felicitate
fertilize finalize finesse fluctuate foreclose formulate fumble fumigate
galvanize generalize germinate gesture glaze gravitate grieve gyrate hibernate
humiliate hydrate hypnotize idolize illuminate immerse immunize impede
implicate implore improvise incarcerate incinerate incite incubate
indoctrinate infiltrate inflate infringe infuse ingratiate innovate insinuate
instigate insulate interrogate intertwine intimidate intrigue inundate
invalidate invigorate irrigate irritate itemize jiggle jostle jubilate juggle
juxtapose lacerate lactate laminate legislate legitimize liberate liquidate
literate lubricate marinate masquerade maximize meditate memorialize mesmerize
metabolize mingle miscalculate misplace modernize modulate monetize monopolize
mutate mutilate narrate nauseate necessitate neutralize normalize notarize
nurture obliterate officiate orientate originate oscillate overestimate
overrate oxidize paralyze paraphrase pasteurize penalize penetrate perforate
permeate perpetuate personalize plagiarize pollinate postulate precipitate
predominate premiere prescribe privatize procrastinate procreate
professionalize proliferate promulgate propagate prosecute pulsate pulverize
puncture quadruple radiate randomize ratiocinate rationalize reciprocate
recuperate reformulate refrigerate regenerate regurgitate reiterate rejuvenate
relegate relieve reminisce remunerate renovate repatriate replicate repudiate
resonate restate resuscitate retaliate reverberate revitalize revive ruminate
salivate salute sanitize saturate scrutinize segregate serenade socialize
stagnate standardize sterilize stifle stigmatize strangle strategize subjugate
sublimate subsidize suffocate synchronize synthesize tabulate tantalize
trample transpire traumatize truncate undulate uproute vacate vaccinate
vandalize vaporize vegetate venerate ventilate vindicate vocalize wriggle""".split()

P_VERBS3 = """abandon abolish abound accent acclimate accost adjourn admonish afflict allot
ambush anoint append applaud apprehend approach ascend ascertain assail
assassinate assess astonish astound attain augment banish banter bask beckon
befriend behold bemoan bewilder blacken blemish blister bluster bolster
bombard brandish brighten broaden burnish cherish christen clobber coarsen
cohere collide conceal concoct condemn confer confess confine conjure consign
constrain contort contradict convict convulse corral cower dampen darken
deafen decompose deduct deepen deflect defraud demolish denounce depict
deplete deplore deploy depress derail detain detract diminish disclaim
discomfort disconnect discredit disdain disembark disenchant disinfect
dismantle dismount disown dispel disperse distill distrust eavesdrop elongate
embolden embroil emit empower encamp encircle encroach endow enlighten enliven
entrench envision err evict exacerbate exclaim exhort expend extort faze feign
ferment flatten flatter flicker flounder fluster forewarn freshen frighten
frolic garner gleam glisten glitter harden hasten hearten heighten hoard
hoodwink humph hunker hush impair impart impeach implant impose imprint
imprison inflict instill interject interlock intermingle intersect intervene
jumble kindle lambast languish lessen lighten likening loiter loosen madden
maim malign meander moisten mumble muse nourish obstruct ordain outlast
outnumber outperform outrun outshine outsmart outweigh overreact oversimplify
overwhelm pamper parch pelt perturb pester pilfer pinpoint plummet plunder
poach pollute preclude prohibit propel protrude provoke quicken ransom ration
ravish rebuff rebuke recant reclaim recoil recommend reconsider redden
rediscover refurbish regard rejoin rekindle relent relish renounce repent
reprimand repulse resound restrain resurrect retract retrench reunite ricochet
ripen roughen sadden scamper scavenge scurry sharpen shorten shrivel sicken
sidestep siphon slacken slather slither smolder smother snicker soften
squander squirm stagger stiffen stomach straighten strew subdue subside
surmise surmount tamper tighten tinker transcend traverse unbutton uncover
undergo underscore understand unsettle untangle unwind uplift usurp vanquish
vex wallow weaken whiten widen worsen""".split()

D_VERBS3 = """blot blur chug clot crop dab dub fan fib gut jam jut lob lug mar nab nag net
pan prim quiz skid slog slur snub stud swab trod vat wag whiz zap""".split()

Y_VERBS3 = """ally codify comply dally decry descry electrify emulsify exemplify gentrify
harry indemnify liquefy mollify mortify mummify objectify ossify petrify
preoccupy prettify putrefy ramify rarefy sanctify shimmy stultify stupefy
typify vivify""".split()

NOUNS3 = """abdomen accordion acorn admiral adobe affair aftermath agony alcove alfalfa
alligator alloy almanac almshouse alphabet altitude aluminum ambulance
amethyst ammunition amphitheater anagram anatomy anecdote animation antenna
anthill anthology antidote antler anvil aorta aperture apex aphid apostle
appliance apprentice apricot aquarium aqueduct arcade archer archipelago
archive archway armada armchair armor armpit armrest arsenal artery artichoke
artifact ashcan ashtray asphalt aspirin asteroid astronaut astronomer asylum
atrium attire auditorium aurora autograph avalanche aviator awning axle
backbone backpack bacterium badger bagel bagpipe bailiff ballad ballast
ballerina ballroom balustrade bandage bandit bandstand banjo banquet baptism
barber barcode barge baritone barley barnacle barnyard barometer barracuda
barrier bartender basil basilica bassoon bastion bathhouse bathtub baton
bayonet bazaar beacon beaker beanstalk bedrock bedroom bedspread beech beehive
beet begonia behemoth belfry bellboy bellhop benchmark beret bicep bifocal
billboard billfold binder binocular biplane birch birdbath birdcage birthday
bison blackberry blackboard blacksmith bladder blizzard blowtorch blueprint
boardwalk boathouse bobcat bodyguard boiler bollard bonfire bongo bookcase
bookend bookmark bookshelf bookstore boomerang boulder boulevard bowtie
bracket bramble bread breadcrumb breakfast breastplate brewery brickyard
briefcase brigand broccoli brochure bronco brook broomstick broth brunch
buffoon bugle bulldozer bulletin bullfrog bumblebee bungalow bunion bunkhouse
burlap burner buttercup buttress cabbage caboose cadet cafeteria caffeine
caldron calendar caliber calipers camper campfire campground campsite
campstool candelabra candidate candlestick candy canister cannonball canopy
cantaloupe canteen canvasback capsule caption caravan caraway carburetor
cardboard cardigan cardinal caricature carnation carnival carousel carpenter
carport carriage casserole cassette catacomb catalog catapult cataract catfish
cathedral catwalk cauldron causeway cedarwood cellophane centipede ceramic
chalkboard chandelier chaperone chaplain charter chauffeur checkpoint
cheekbone cheetah chestnut chickadee chipmunk chisel chowder chronicle
churchyard cinder cinnamon citadel clarinet cleaver clipboard clipper
cloakroom clocktower clover coalmine cobbler cobweb cockpit cocktail cocoon
codex cologne colt comedian commuter compound concourse condiment condo condor
conduit confetti conglomerate congregation conifer connoisseur conservatory
consonant constable constellation consulate contraption cookbook copilot
copperhead coriander corkscrew cornbread cornfield cornice coroner corsage
cortex cosmonaut cottonwood cougar courier courtyard coyote crampon cranberry
crankcase crankshaft crayfish creampuff creek crescent crevasse crockery
crocodile croissant crossbeam crossbow crossword crowbar crucible cruiser
crumpet crusade crutch cubicle culvert cupboard cupcake curator curfew
curriculum cutlery cyclone cylinder cymbal daffodil dagger dandelion dashboard
daybreak deacon debut decanter decathlon deckhand decoy delta dentistry
derrick detour dictator digit dinghy dinosaur diploma dipstick dirigible
dispenser dividend doghouse dolphin doorbell doorknob doormat doorstep
dormitory dovetail downpour dragnet dragonfly dresser dribble driftwood
drizzle drumstick dumpling dungeon duplex dustpan dynamo earlobe earmuff
earring earthworm easement eggplant eggshell elk embankment ember emerald
emporium enclosure encyclopedia enigma ensemble entourage envoy enzyme
epilogue epoch escort espresso estuary eucalyptus eulogy evergreen ewe excerpt
expanse expedition eyebrow eyedropper eyelash eyelid fairway falconer
farmhouse fathom faucet fawn fedora ferret fiddle fieldwork fiesta figment
fingertip firefly fireplace firetruck firewood fishhook fixture fjord flagpole
flagship flamingo flashlight fleece flipper floodgate florist flotilla foal
foghorn folklore footbridge foothill foothold footnote footprint footstool
forearm forecast forehead foreman forklift fortnight foxglove foyer freckle
freeway freighter fresco frigate fritter fudge fulcrum fuselage gangplank
gatehouse gazebo gazelle gazette gearbox gecko geyser gherkin gimmick glade
glider glossary goblet goblin godmother goldfish gondola gong gopher gourd
granary grandstand grapefruit grapevine grasshopper gravel gravestone
greenhouse griddle griffin grindstone grotto groundhog grouse guardian
guidebook gumdrop gunpowder gymnasium gyroscope hacksaw haddock hailstone
hairbrush hairpin hallway hamlet hammock hamster handbag handbook handcuff
handlebar handrail hangar hatchet haven hawthorn hayloft haystack headband
headlight headline headphone headrest hearth heath hedgerow heirloom
helicopter hemisphere henhouse heron herring hexagon hickory hideout highway
hillside hilltop hippopotamus hitch hologram homestead homestretch homework
horsefly horseshoe hosepipe hotbed hourglass houseboat hovercraft hubcap
huddle hummingbird hurricane husk hyena icebox icicle ideology igniter iguana
incubator infirmary ingot inkstand inkwell inscription insignia intermission
intersection interval invoice iota jackal jackpot jamboree javelin jawbone
jigsaw jukebox junction juniper kangaroo kayak keepsake ketchup keyhole
keyring khaki kilogram kilometer kingdom kinship knapsack kneecap knuckle
koala labyrinth lagoon lair lampshade landfill landlord landmark lapdog lapel
larder lark lasagna latitude lattice laurel lavender lawsuit lectern ledger
leech legion lemonade lentil levee lifeboat lifeguard lighthouse lilac lily
limescale limousine linchpin lineage lineup linguist lintel liquor llama
locket locksmith locomotive locust lodestone loin lollipop longitude lookout
lozenge luggage lullaby lumberjack luncheon lynx macaroni mackerel maestro
magazine maggot magistrate magnolia mahogany mailbox mainland mainstay
makeover mallard mallet mandate mandolin manger mannequin manor mantel mantis
marathon marigold marina mariner marketplace marmalade marquee marrow
marsupial mascot masterpiece mastiff matchbox matchstick matrix mattock
mausoleum maverick mayor meadowlark medallion megaphone membrane memoir menace
merchant meridian meringue mesa metaphor metronome mezzanine microphone
microscope midday midnight midpoint mileage milestone militia millennium
minaret minefield miniature minnow minstrel mishap mistletoe mitten moccasin
mockingbird molar molecule mollusk monocle monorail monsoon moped moraine
morale mortar mothball motif motorcade motorcycle mouthpiece mozzarella
mudslide muffin mulberry mullet multitude muskrat muzzle nanny narrative
necktie nectar nectarine neighborhood neuron newsletter newsstand nightfall
nightingale nightstand nimbus nitrogen nomad noodle nostril notebook notepad
nova novella nuisance numeral nutmeg nylon oarlock oboe obstacle octagon
odyssey offspring ointment oleander olive omelet omen onlooker onslaught opal
optician oracle orangutan oregano oriole ottoman outback outboard outcrop
outhouse outpost outskirts overcoat overture oxbow oxcart ozone pagoda palette
pamphlet pancake pancreas panorama pantry papaya paperweight paprika parabola
parachute paradox parakeet parapet parasol parchment parka parkway parsnip
partition partridge pastry pathway patio patriarch patron pavilion peacock
pecan pedestal pedestrian pediment pelican pendant pendulum penguin peninsula
penknife pennant penthouse percussion perimeter periscope permafrost petunia
pewter phantom pharmacy pheasant phoenix photograph pickaxe pickle picnic pier
pigment pigpen pigtail pilgrim pillbox pillowcase pinafore pincer pinecone
pinnacle pinwheel pistachio pitchfork placard placemat planetarium plankton
plateau platoon playground playpen plaything playwright plowshare plywood
poacher pocketbook podium poinsettia polka pomegranate poncho pontoon poodle
popcorn poplar poppy porcelain porcupine porthole postcard poster posture
potluck pottery poultice powerhouse precinct precipice predator prelude
premise presto pretzel primrose privet probation procession professor
prognosis prologue promenade propellant propeller proprietor protein prototype
protractor proverb province prow prune psalm pseudonym psyche pterodactyl
publisher puddle pufferfish pulley pullover pumpkin puppy pushcart putty pylon
python quadrant quagmire quail quarterback quartet quasar quiche quicklime
quicksand quota quotient racetrack raceway racket radish rafter ragtime
ragweed raincoat rampart rancher rapport raptor rascal ravioli rawhide reactor
rebate receptacle recipe recliner rectangle redwood reedbed referee reflex
refuge regiment registry rehearsal relay renegade repertoire reservoir retina
rhinoceros rhubarb riverbank riverbed roadblock roadhouse roadway robin
rollercoaster rooftop rosebud rosemary roster rostrum rotunda roulette
roundabout rowboat rucksack ruffian runway rye saber sable saddlebag sagebrush
sailboat salamander salsa sandal sandbar sandpaper sandstone sapphire
satellite sawdust sawhorse sawmill saxophone scabbard scallop scarecrow scarf
schooner scimitar scoreboard scorpion scrapbook seabird seashell seashore
seedling semicircle senate sentry sequel sequoia serum shamrock shantytown
shipyard shoal shoehorn shoelace shotgun showcase shuttle sideboard sidecar
sidewalk signode signpost silhouette silo sitar skateboard skylark skylight
skyline skyscraper sledge sleigh slingshot smokestack snapdragon snowdrift
snowflake snowplow snowshoe sojourn solarium solvent sombrero sonata sonnet
soot souvenir spa spaghetti spatula spearhead spearmint specimen spectacle
spectrum sphinx spigot spinach spindle spool sprocket spyglass squash
stagecoach staircase stairway stairwell stallion stampede stanchion starboard
starfish statute steamboat steamship steeple stencil stepladder
stockpile stopwatch storefront storyteller stovepipe stowaway streetcar
stretcher strudel stylist subcontinent submarine suitcase sunbeam sundial
sunflower sunrise sunset sunshine superhighway surfboard swordfish sycamore
synagogue syringe tabernacle tablecloth tadpole taffeta tailgate tambourine
tandem tangerine tapioca tarantula tarpaulin tattoo teaspoon telegram
telegraph teller tempest tempo tentacle tepee terrarium terrier textbook
thatch theater thermometer thermos thimble thistle thoroughfare threshold
throttle thumbtack thunderstorm tiara tightrope timberline tollbooth tollgate
tong toolbox topaz torchlight tornado torrent tote toucan tourniquet towel
township trampoline trapdoor trapezoid trawler treadmill treetop trellis
tributary tricycle trinket tripod trove trowel truce tugboat tundra turnpike
turnstile turntable turquoise tuxedo twister typhoon ukulele undercurrent
undergrowth unicorn unicycle upholstery utensil vagrant valise vanguard
vantage vassal veal vellum velocity veranda verdict vertebra vestibule viceroy
vicinity viewpoint vigil villain viola violoncello vireo visor vixen
volleyball voltage vulture wagtail walkway wallboard wallet walnut warbler
warden warehouse warthog washboard washtub watchdog watchtower waterfront
waterway wavelength weathervane weevil wellspring wheelbarrow whippoorwill
whirlpool whirlwind wholesaler wigwam wildcat windlass windmill windpipe
windshield wingspan wingtip wiretap wishbone wisteria woodland woodpecker
woodpile woodshed workbench workbook workshop wormhole wristband yardstick
yearbook yoga yogurt zeppelin zinnia zipline zucchini""".split()

Y_NOUNS2 = """acuity agility ambiguity amnesty animosity apathy atrocity audacity austerity
autonomy banality bankruptcy biology botany brevity brutality burglary bursary
calamity captivity causality causticity cavity centenary chivalry civility
clarity clemency commodity complexity complicity conspiracy constituency
continuity courtesy credibility cruelty curiosity custody decency deformity
deity depravity dexterity dignity diplomacy directory disparity diversity
ductility ecology efficacy effigy elasticity electricity elegy empathy enmity
enormity equality equity eternity ethnicity extremity fallacy fecundity felony
ferality ferocity fidelity finery fluency fluidity formality frailty
fraternity frivolity frugality futility gaiety gallantry generosity gentility
gravity guaranty heredity hierarchy hilarity honesty hostility humanity
humidity humility identity immensity immunity impunity infamy infinity
iniquity insolvency insurgency integrity intensity intimacy jeopardy jollity
laxity legacy lethargy levity liturgy longevity lunacy majesty malady mastery
maternity matrimony mediocrity misery mobility modality modesty monarchy
monogamy morality mortality mutiny mythology necessity nicety nobility
normalcy notoriety novelty nudity obesity obscurity oddity opacity paternity
paucity pedagogy perjury perplexity philosophy phony piety polity posterity
potency poverty privacy probability proclivity prodigy profanity proficiency
profundity progeny propensity prophecy prosperity proximity prudery puberty
publicity pungency purity quality quantity rigidity rivalry royalty salary
salinity sanctity sanity savagery scarcity secrecy senility seniority serenity
severity similarity simplicity sincerity sobriety solidarity solvency
sovereignty sparsity spontaneity stability sterility stupidity subsidy
subtlety supremacy surety symmetry symphony synergy tapestry technology
telemetry tenacity testimony theocracy therapy timidity tranquility treachery
trickery trilogy trinity tyranny unity urgency utility vacancy vagary valency
vanity variety veracity verbosity verity villainy virginity virility
virtuosity viscosity vitality vivacity vulgarity zoology""".split()

ES_NOUNS3 = """annex blitz bluff hunch lunch stitch waltz wrench""".split()

IDENTITY3 = """abject ablaze abreast abrupt absolute abuzz adamant adept adjacent adrift
aerial affable affluent afloat afoot aghast agog ahead ajar akin alight
aliquot alkaline allergic aloft aloud amber ambient amiss ample amuck
ancillary anemic angular anterior antique arable arcane ardent arduous askew
astir astute atypical audacious austere authentic avid awash awhile backward
banal barbaric bashful bayou bedraggled beige belated bemused benevolent
benign bereft berserk bilateral bilingual bipartisan blatant bleary blissful
boisterous bona bovine brackish brash brawny brazen brittle brusque bulbous
bulky bumpy buoyant burly bygone candid cardiac carefree caustic cerebral chic
chivalrous chubby circular clammy clandestine coastal cogent colossal comatose
combative comely commonplace communal compulsory concave concentric concurrent
congenial congested conjoint connate contrite convex copious cordless
corporeal covert crafty craven crestfallen crooked cryptic cumbersome cursory
curt daft dainty dapper dastardly daunting decadent deciduous decrepit deft
defunct demure derelict devious devout diagonal diffuse dilapidated dingy
dismal docile dogged dolorous dowdy drab drowsy ductile dulcet dun duplicitous
dutiful eerie effusive elated elite elusive emphatic enigmatic ephemeral
equidistant ersatz erudite esoteric euphoric exempt exorbitant expedient
exquisite extant exuberant facetious fallow fastidious feral fervent fickle
fictitious finite flagrant flimsy flippant fluffy fluorescent forlorn
forthright fractional fraught frivolous frothy frumpy fulsome gallant gangly
garish garrulous gaudy gaunt genial ghastly glib glossy gnarled grandiose
grimy grubby gruff gullible hale haphazard hapless hardy haughty hazy hearty
hefty heinous herbal hilarious hoarse homely humane humdrum husky icky iconic
idyllic immaculate immobile impeccable imperative imperious impervious
impetuous implacable impromptu improper inane inept inert infernal innocuous
inquisitive insidious insipid insolent intrepid irate irksome itinerant jaded
jagged jaunty jocular jovial jubilant judicious keenly lanky lax leery
lethargic limber listless lithe livid lofty loquacious lucrative ludicrous
lukewarm luminous lurid luscious lustrous macabre malleable mammoth mangy
manifold maudlin mediocre meek melancholy mellifluous menial meticulous
mirthful miserly modish moot morbid moribund morose muggy multiple murky muted
myopic nascent nautical nebulous nefarious nocturnal nonchalant nondescript
nubile oblivious obstinate obtuse odious offbeat olfactory ominous onerous
opaque opulent ornery ostensible outlandish palatable pallid paltry paramount
pastel pastoral patchy pensive peppy perky pernicious pertinent pesky petite
petulant picturesque pithy placid plaintive pliable plucky plush poignant
poised pompous porous portly posh potable prickly prolific prudish puny pushy
quizzical rabid rambunctious rancid rapt raucous ravenous recalcitrant
reclusive redolent remiss replete resilient resolute resplendent reticent
rickety rife risque rosy rotund rowdy ruddy rudimentary rueful rugged runic
sallow sardonic sassy savvy scanty scrawny scruffy seamless sedate seedy
serendipitous shabby shoddy shrewd shrill skimpy sleazy slick sluggish sly
smug snide soggy somber spry spurious squeamish staid stalwart stocky stodgy
stoic strenuous strident stringent stubby stuffy suave sublime succinct
succulent sultry sumptuous sundry supple surly svelte swanky tacit tactful
tactile tangy tardy tawdry tawny tenacious tenuous terse thrifty timely torpid
translucent treacherous tremulous trite truculent turbulent turgid ubiquitous
uncouth unduly unkempt unruly unwieldy upbeat uppity vapid vehement verbose
versatile vicarious vivacious voracious wanton wayward whimsical wholesome
willful wily wistful woeful wry zany zesty""".split()


def _plural(base: str, cls: str) -> str:
    if cls == "y":
        return base[:-1] + "ies"
    if cls == "es" or base.endswith(("s", "x", "z", "ch", "sh")):
        return base + "es"
    return base + "s"


def _past(base: str, cls: str) -> str:
    if cls == "y":
        return base[:-1] + "ied"
    if cls == "e":
        return base + "d"
    if cls == "d":
        return base + base[-1] + "ed"
    return base + "ed"


def _gerund(base: str, cls: str) -> str:
    if cls == "e":
        return base[:-1] + "ing"
    if cls == "d":
        return base + base[-1] + "ing"
    return base + "ing"


def _build_golden() -> dict:
    golden: dict[str, str] = {}
    for base in E_VERBS + E_VERBS2 + E_VERBS3:
        golden[_plural(base, "e")] = base
        golden[_past(base, "e")] = base
        golden[_gerund(base, "e")] = base
    for base in D_VERBS + D_VERBS2 + D_VERBS3:
        golden[_plural(base, "d")] = base
        golden[_past(base, "d")] = base
        golden[_gerund(base, "d")] = base
    for base in SI_VERBS:
        golden[_plural(base, "d")] = base
        golden[_gerund(base, "d")] = base
    for base in Y_VERBS + Y_VERBS2 + Y_VERBS3:
        golden[_plural(base, "y")] = base
        golden[_past(base, "y")] = base
        golden[_gerund(base, "y")] = base
    for base in P_VERBS + P_VERBS2 + P_VERBS3:
        golden[_plural(base, "p")] = base
        golden[_past(base, "p")] = base
        golden[_gerund(base, "p")] = base
    for base in P_VERBS_NO_ING:
        golden[_plural(base, "p")] = base
        golden[_past(base, "p")] = base
    for base in NOUNS + NOUNS2 + NOUNS3:
        golden[_plural(base, "p")] = base
    for base in ES_NOUNS + ES_NOUNS2 + ES_NOUNS3:
        golden[_plural(base, "es")] = base
    for base in Y_NOUNS + Y_NOUNS2:
        golden[_plural(base, "y")] = base
    for w in IDENTITY + IDENTITY2 + IDENTITY3:
        golden[w] = w
    # every direct conflation is itself a golden pair
    golden.update(KSTEM_EXCEPTIONS)
    # length-guard / doubly-irregular extras the generator skips
    golden.update({
        "uses": "use", "dies": "die", "ties": "tie", "lies": "lie",
        "goes": "go", "agreed": "agree", "agrees": "agree",
        "agreeing": "agree", "freed": "free", "frees": "free",
        "freeing": "free", "seeing": "see", "reading": "read",
        "heroes": "hero", "quizzes": "quiz",
    })
    # Round-5: the former DIVERGES entries, resolved to dictionary-exact
    # KStem behavior. The probe ORDER decides the ambiguous readings:
    # the -es branch tries minus-'s' first, so lives/leaves/does take
    # the -e reading that IS in the lexicon (live/leave/doe — the same
    # quirk real KStem is known for, e.g. does -> doe); whole-word
    # dictionary hits win outright (pants, training); the old blanket
    # "-us identity" rule is now KStem's actual "-ous/-ss only" guard,
    # so out-of-lexicon -us plurals strip normally (bureaus, menus)
    # while -us dictionary nouns stay identity via the lexicon check
    # (virus, census, status, ...). "suite" is now a lexicon entry, so
    # suited/suiting/suites conflate to it via the +e-first probes —
    # exactly what dictionary-exact KStem does with both suit and suite
    # as entries — while "suits" still strips plain -s to "suit".
    golden.update({
        "axes": "axe", "lives": "live", "leaves": "leave", "does": "doe",
        "pants": "pants", "training": "training",
        "bureaus": "bureau", "menus": "menu",
        "suites": "suite", "suited": "suite", "suiting": "suite",
        "suits": "suit", "statuses": "status", "viruses": "virus",
        "censuses": "census", "buses": "bus", "fungi": "fungi",
        "syllabuses": "syllabus", "walruses": "walrus",
        "octopuses": "octopus", "sinuses": "sinus",
    })
    return golden


GOLDEN = _build_golden()

# Round-5: EMPTY. Every formerly-pinned divergence is resolved to
# dictionary-exact KStem behavior and lives in GOLDEN now (see the
# round-5 block in _build_golden): the blanket "-us identity" spelling
# rule was narrowed to KStem's real "-ous"/"-ss" guard (bureaus/menus
# strip; -us dictionary nouns stay identity via the lexicon), "suite" /
# "training" / "axe" / "doe" became lexicon entries so the documented
# probe order (minus-'s' first, '+e' first, whole-word first) produces
# the KStem readings (does -> doe, suited -> suite, training identity).
# Any future fidelity gap must be pinned here with a rationale.
DIVERGES: dict[str, tuple[str, str]] = {}


def test_golden_pairs():
    assert len(GOLDEN) >= 10000, f"only {len(GOLDEN)} golden pairs"
    bad = {w: (krovetz_lite(w), want) for w, want in GOLDEN.items()
           if krovetz_lite(w) != want}
    assert not bad, f"{len(bad)} golden KStem pairs broken: {dict(list(bad.items())[:25])}"


def test_all_bases_in_lexicon():
    """The generated conflations rely on the dictionary-first lookups —
    every base word must be a lexicon entry (single source of truth)."""
    bases = set(
        E_VERBS + D_VERBS + SI_VERBS + Y_VERBS + P_VERBS + P_VERBS_NO_ING
        + NOUNS + ES_NOUNS + IDENTITY + E_VERBS2 + D_VERBS2 + Y_VERBS2
        + P_VERBS2 + NOUNS2 + Y_NOUNS + ES_NOUNS2 + IDENTITY2
        + E_VERBS3 + D_VERBS3 + Y_VERBS3 + P_VERBS3 + NOUNS3
        + Y_NOUNS2 + ES_NOUNS3 + IDENTITY3
    )
    missing = sorted(b for b in bases if len(b) > 3 and b not in KSTEM_LEXICON)
    assert not missing, f"bases missing from KSTEM_LEXICON: {missing}"


def test_pinned_divergences():
    for w, (out, _why) in DIVERGES.items():
        assert krovetz_lite(w) == out, (
            f"pinned divergence for {w!r} drifted: "
            f"{krovetz_lite(w)!r} != {out!r}"
        )


def test_dictionary_first():
    # lexicon/conflation entries must win over the suffix rules
    assert krovetz_lite("news") == "news"          # -s rule would strip
    assert krovetz_lite("agreed") == "agree"       # heuristic would give 'agre'
    assert krovetz_lite("movies") == "movie"       # -ies rule would give 'movy'
    assert krovetz_lite("women") == "woman"        # irregular plural
    assert krovetz_lite("controlled") == "control" # 'l' excluded from heuristic undo
    # and stay inert for non-alpha / short tokens
    assert krovetz_lite("new5") == "new5"
    assert krovetz_lite("was") == "was"


def _oracle_words() -> list[str]:
    words = sorted(set(GOLDEN) | set(DIVERGES) | set(KSTEM_EXCEPTIONS)
                   | set(KSTEM_LEXICON))
    fuzz = [
        b + s for b in ("tab", "merg", "cross", "buzz", "roll", "carr",
                        "fre", "spe", "gl", "xy", "danc", "stud", "visit",
                        "controll", "qui")
        for s in ("", "s", "es", "ies", "ed", "ied", "ing", "ss", "us", "sses")
    ]
    return words + fuzz


@pytest.mark.parametrize("chunk", [0, 1])
def test_oracle_sql_replays_stemmer_exactly(chunk):
    """DuckDB scalar CASE == python krovetz_lite for every golden/pinned
    word plus suffix-heavy fuzz — the tokenization invariant (CLAUDE.md)."""
    words = _oracle_words()[chunk::2]
    con = duckdb.connect()
    sql = _kstem_sql("w")
    got = con.execute(
        f"SELECT w, {sql} FROM (SELECT unnest(?) AS w)", [words]
    ).fetchall()
    bad = [(w, sq, krovetz_lite(w)) for w, sq in got if sq != krovetz_lite(w)]
    assert not bad, f"{len(bad)} oracle/stemmer mismatches: {bad[:20]}"


def test_join_oracle_replays_stemmer_exactly():
    """The hash-join stem map (gate.kstem_map_ctes — what the corpus
    gate oracle actually executes) == python krovetz_lite over the same
    word set, with stopwords mapped to '' position slots."""
    from searchengine_spark.analyzer import LUCENE_STOPWORDS
    from searchengine_spark.gate import kstem_map_ctes

    words = _oracle_words()
    con = duckdb.connect()
    got = con.execute(
        f"WITH vocab AS (SELECT unnest(?) AS w), {kstem_map_ctes('vocab')} "
        f"SELECT w, kt FROM kstems",
        [words],
    ).fetchall()

    def expect(w: str) -> str:
        return "" if w in LUCENE_STOPWORDS else krovetz_lite(w)

    bad = [(w, kt, expect(w)) for w, kt in got if kt != expect(w)]
    assert not bad, f"{len(bad)} join-oracle/stemmer mismatches: {bad[:20]}"
