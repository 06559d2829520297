SELECT COUNT(*) FROM posts as p, postLinks as pl WHERE pl.PostId = p.Id AND p.PostTypeId>=4 AND p.CommentCount=13 AND pl.LinkTypeId<=2 AND pl.CreationDate<='2013-10-02 09:21:05'::timestamp;
