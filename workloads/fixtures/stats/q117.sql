SELECT COUNT(*) FROM posts as p, postLinks as pl WHERE pl.PostId = p.Id AND p.PostTypeId>=3 AND p.AnswerCount<=8 AND p.FavoriteCount>=10 AND pl.CreationDate<='2011-02-01 04:13:09'::timestamp;
